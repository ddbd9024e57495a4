package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm pass: run EVERY query once at the smallest sf first. The
    // whole-stage codegen cache is keyed on generated source, which is
    // identical across scale factors, so this compiles each plan's
    // codegen classes (and fills the parquet schema cache) once —
    // the timed pass below then measures data processing at the
    // target sf, not per-plan one-time JIT.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    else
      // a silently skipped warm pass would shift every timing with no
      // signal — say so (stderr keeps the stdout JSON line clean)
      System.err.println(s"[bench] warm dir $warmDir missing; timings " +
        "include per-plan JIT")
    // Pre-fill the per-path schema cache for the TARGET sf too, so no
    // timed query pays the one-time parquet footer inference.
    graft.sources.Tables.names.foreach { n =>
      try graft.sources.Tables.load(spark, sfDir, n).schema
      catch { case _: Throwable => () }
    }
    // A failed query must surface as an error, never masquerade as a
    // (fast!) timing — errors are reported per query in the JSON line
    // (the exit stays 0 so the line itself is always delivered).
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage)
            .getOrElse("").takeWhile(_ != '\n').take(160)}")
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    def jstr(s: String): String =
      s.flatMap {
        case '\\' => "\\\\"
        case '"' => "\\\""
        case c if c < ' ' => "\\u%04x".format(c.toInt)
        case c => c.toString
      }.mkString("\"", "", "\"")
    // The harness keeps only the LAST ~2k chars of output, so the line
    // must stay compact and put the headline fields AFTER the
    // per-query map, sorted fastest-first so the slowest — most
    // informative — queries sit nearest the end of the line.
    // Locale.ROOT: the f interpolator uses the JVM default locale, and
    // a comma-decimal locale would emit invalid JSON. Per-query times
    // print at 2 decimals so the whole line (84 queries) stays inside
    // the harness's ~2k-char output tail; the total keeps 3.
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def sec2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.sortBy(_._2)
      .map { case (k, v, _) => jstr(k) + ":" + sec2(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val sfName = sfDir.split('/').last
    println(s"""{"queries":$qs,"errors":$errs,"sf":"$sfName","n":${results.size},"unit":"sec","metric":"total","value":${sec(total)}}""")
    spark.stop()
  }
}
