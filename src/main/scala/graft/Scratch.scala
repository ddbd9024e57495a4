package graft
import org.apache.spark.sql.SparkSession

/** Dev scratchpad for A/B timing experiments (not part of the
  * operator surface; rewritten per investigation).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("sim_pq_adc_topk", "sim_pq_refine_topk",
      "sim_ivfpq_topk", "sim_ivfpq_refine_topk")
    // warm
    graft.queries.ExtensionQueries.prebuildStages(spark, sfDir)
    names.foreach(n => SparkEntry.queries(n)(spark, sfDir).count())
    var best = Map[String, Double]().withDefaultValue(1e9)
    var stBest = Map[String, Double]().withDefaultValue(1e9)
    for (r <- 1 to 4) {
      graft.queries.ExtensionQueries.evictStages(spark, sfDir)
      graft.queries.ExtensionQueries.prebuildStages(spark, sfDir)
        .foreach { case (k, v) =>
          stBest = stBest.updated(k, math.min(stBest(k), v)) }
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        best = best.updated(n,
          math.min(best(n), (System.nanoTime() - t0) / 1e9))
      }
    }
    stBest.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"[pq] stage $k%-22s $v%6.3f") }
    names.foreach(n => println(f"[pq] query $n%-22s ${best(n)}%6.3f"))
    println(f"[pq] TOTAL ${stBest.values.sum + names.map(best).sum}%6.3f")
    spark.stop()
  }
}
