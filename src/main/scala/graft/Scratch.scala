package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ext._
import graft.queries.ExtensionSupport

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
    def docs = graft.sources.Tables.load(spark, sfDir, "documents")
    def emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    def t(label: String)(f: => Long): Unit = {
      var best = 1e9
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime(); val c = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        if (c < 0) println("")
      }
      println(f"[scr] $label%-24s $best%7.3f s")
    }
    t("lex:bm25") {
      TextAnalysis.bm25TopK(docs, col("doc_id"), col("text"),
        Seq("data", "join", "hash"), 20).count()
    }
    t("vec:brute") {
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("neighbor_id"))
      Similarity.bruteForceTopK(emb.filter(col("id") === 0), emb, 20)
        .withColumn("rnk", row_number().over(w).cast("int"))
        .select(col("neighbor_id").as("doc_id"), col("rnk")).count()
    }
    t("full:rrf") {
      SparkEntry.queries("sim_hybrid_rrf")(spark, sfDir).count()
    }
    spark.stop()
  }
}
