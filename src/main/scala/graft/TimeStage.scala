package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{DedupOps, TextAnalysis}

/** Dev harness: repeat-time the shared cc_labels stage (LSH pairs →
  * connected components) WITHOUT the ExtensionQueries memo, so
  * per-round changes to the iterative loop get a clean multi-rep
  * signal instead of one cold sample per JVM.
  */
object TimeStage {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def cc(dir: String): Long = {
      val d = graft.sources.Tables.load(spark, dir, "documents")
      val pairs = DedupOps.lshCandidatePairs(d, col("doc_id"),
        TextAnalysis.shingles(col("text"), 2), numHashes = 12, bands = 4)
      DedupOps.connectedComponents(d.select(col("doc_id").as("id")), pairs)
        .count()
    }
    cc(sfDir) // warm: codegen + schema caches (same dir as the reps)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = cc(sfDir)
      println(f"[stage] rep$r cc_labels ${(System.nanoTime() - t0) / 1e9}%7.3f s rows=$n")
    }
    spark.stop()
  }
}
