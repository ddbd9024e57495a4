package graft

/** Round-scoped A/B prober (rewritten every round — dev tool, not
  * product surface). Round 19: per-stage build profiler — evict all
  * shared stages, then time each build in bench order (min over
  * reps), optionally printing the formatted plan for named stages.
  *
  * `runMain graft.Scratch <sfDir> <reps> [explain:<s1,s2>] [only:<s1,s2>]`
  */
object Scratch {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val explain = args.find(_.startsWith("explain:"))
      .map(_.stripPrefix("explain:").split(',').toSet)
      .getOrElse(Set.empty[String])
    val only = args.find(_.startsWith("only:"))
      .map(_.stripPrefix("only:").split(',').toSet)
      .getOrElse(Set.empty[String])
    System.clearProperty("graft.stage.dir")
    val cpus = Bench.cpus
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B hook for the ObjectHashAggregate fallback experiment
    sys.env.get("GRAFT_OHA_FALLBACK").foreach(v => builder.config(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val thunks = graft.queries.ExtensionQueries.stageThunks(spark, sfDir)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
    // one full warm build pass (codegen/JIT), then timed evict+rebuild
    graft.queries.ExtensionQueries.prebuildStages(spark, sfDir)
    val raw = graft.queries.ExtensionQueries.stageRawFrames(spark, sfDir)
      .toMap
    for ((name, thunk) <- thunks) {
      if (explain(name)) {
        println(s"===== $name =====")
        raw.get(name).foreach(_().explain("formatted"))
      }
      val times = (1 to reps).map { _ =>
        graft.ext.Stages.evict(spark, s"$sfDir|$name")
        val t0 = System.nanoTime()
        thunk().count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[stage] $name%-22s " +
        times.map(t => f"$t%.3f").mkString(" ") +
        f"  min=${times.min}%.3f")
    }
    spark.stop()
  }
}
