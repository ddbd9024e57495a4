package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad — ad-hoc timing probes for whatever operator is
  * under the knife this round. Not part of the library surface.
  *
  * Round 17: tier timings for the REVERTED dedup_minhash_lsh (the
  * key-array emit-once was a measured negative result; the shipped
  * distinct tail needs its own SF10 row — same method as
  * ScaleExponents: toRdd.count, 2 reps per tier, min folds).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tiers = Seq(("1x", "/root/testdata/sf0.1"),
      ("10x", "target/sf1"), ("100x", "target/sf10"))
    for ((tier, dir) <- tiers) {
      var rows = 0L
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        rows = SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
          .queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scr] $tier%-5s dedup_minhash_lsh " +
        f"${ts.map(t => f"$t%.2f").mkString("/")} s rows=$rows")
    }
    spark.stop()
  }
}
