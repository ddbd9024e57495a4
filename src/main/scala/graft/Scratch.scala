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
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("text_tfidf")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("[scr] EX " + "(?<!Reused)Exchange".r.findAllIn(p).length +
      " RE " + "ReusedExchange".r.findAllIn(p).length +
      " GEN " + "Generate".r.findAllIn(p).length)
    println(p.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Generate") ||
        l.contains("HashAggregate")).mkString("\n"))
    spark.stop()
  }
}
