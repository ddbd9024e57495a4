package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad — ad-hoc timing probes for whatever operator is
  * under the knife this round. Not part of the library surface.
  *
  * Round 17: tpch_q18 FD-fused single-aggregate form vs the textbook
  * re-join + re-group shape it replaced — same session A/B.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    def q18Old() = {
      val l = t("lineitem")
      val big = l.select(col("l_orderkey").as("__lk"),
          col("l_quantity").cast("long").as("__lq"))
        .groupBy(col("__lk")).agg(sum(col("__lq")).as("__q"))
        .filter(col("__q") > 200).select(col("__lk").as("__bk"))
      val o = t("orders")
        .join(big, col("o_orderkey") === col("__bk"), "left_semi")
      val c = t("customer")
      l.select(col("l_orderkey").as("__jk"), col("l_quantity"))
        .join(o.join(c, col("o_custkey") === col("c_custkey")),
          col("o_orderkey") === col("__jk"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(sum(col("l_quantity").cast("long"))
          .cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }
    for (rep <- 1 to 6) {
      var t0 = System.nanoTime()
      var c = SparkEntry.queries("tpch_q18")(spark, sfDir)
        .queryExecution.toRdd.count()
      println(f"[scr] rep$rep new  ${(System.nanoTime()-t0)/1e9}%8.3f s rows=$c")
      t0 = System.nanoTime()
      c = q18Old().queryExecution.toRdd.count()
      println(f"[scr] rep$rep old  ${(System.nanoTime()-t0)/1e9}%8.3f s rows=$c")
    }
    spark.stop()
  }
}
