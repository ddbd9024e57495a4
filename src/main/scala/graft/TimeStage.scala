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
    // breakdown: pair job alone vs the cc wrapper around it
    for (r <- 1 to reps) {
      val d = graft.sources.Tables.load(spark, sfDir, "documents")
      val t0 = System.nanoTime()
      val pairs = DedupOps.lshCandidatePairs(d, col("doc_id"),
        TextAnalysis.shingles(col("text"), 2), numHashes = 12, bands = 4)
      val np = pairs.count()
      val t1 = System.nanoTime()
      println(f"[stage] rep$r lsh_pairs ${(t1 - t0) / 1e9}%7.3f s rows=$np")
    }
    // sub-plan breakdown of the pair job (mirrors lshCandidatePairs internals)
    for (r <- 1 to reps) {
      val d = graft.sources.Tables.load(spark, sfDir, "documents")
      val sh = TextAnalysis.shingles(col("text"), 2)
      val t0 = System.nanoTime()
      val based = d.select(col("doc_id").as("__id"), explode(sh).as("__sh"))
        .select(col("__id"), DedupOps.shingleHash(col("__sh")).as("__h"))
      val nb = based.count()
      val t1 = System.nanoTime()
      val coef = DedupOps.minhashCoefficients(12)
      val mins = coef.zipWithIndex.map { case ((a, b), i) =>
        min((lit(a) * col("__h") + lit(b)) % DedupOps.MinhashP).as(s"__m$i")
      }
      val sig = based.groupBy("__id").agg(mins.head, mins.tail: _*)
      val ns = sig.count()
      val t2 = System.nanoTime()
      println(f"[stage] rep$r sub: explode+md5 ${(t1 - t0) / 1e9}%7.3f s rows=$nb; +groupBy ${(t2 - t1) / 1e9}%7.3f s rows=$ns")
    }
    spark.stop()
  }
}
