package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad — ad-hoc timing probes for whatever operator is
  * under the knife this round. Not part of the library surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Long): Unit = {
      var best = 1e9
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime(); val c = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        if (c < 0) println("")
      }
      println(f"[scr] $label%-28s $best%7.3f s")
    }
    def tbl(n: String) = graft.sources.Tables.load(spark, sfDir, n)

    // tpch_q18 decomposition
    def l = tbl("lineitem")
    t("lineitem-scan2col") {
      l.select("l_orderkey", "l_quantity").count()
    }
    def big = l.select(col("l_orderkey").as("__lk"),
        col("l_quantity").as("__lq"))
      .groupBy(col("__lk"))
      .agg(sum(col("__lq").cast("decimal(18,2)")).as("__q"))
      .filter(col("__q") > 200)
      .select(col("__lk").as("__bk"))
    t("qualifying-agg") { big.count() }
    def o = tbl("orders")
      .join(broadcast(big), col("o_orderkey") === col("__bk"), "left_semi")
    t("orders-semi") { o.count() }
    t("full-q18") { SparkEntry.queries("tpch_q18")(spark, sfDir).count() }
    spark.stop()
  }
}
