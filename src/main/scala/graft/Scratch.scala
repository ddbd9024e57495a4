package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad — ad-hoc timing probes for whatever operator is
  * under the knife this round. Not part of the library surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("dedup_substring", "dedup_editdist")
    for (rep <- 1 to 3; n <- names) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
      println(f"[scr] rep$rep $n%-28s ${(System.nanoTime()-t0)/1e9}%8.3f s rows=$c")
    }
    spark.stop()
  }
}
