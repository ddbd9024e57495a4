package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Thread/partition count of the OFFICIAL session — the single
    * definition QProbe mirrors, so probe timings stay comparable to
    * the official figures on any host (a hardcoded 32 in the probe
    * silently diverged whenever this derivation changed).
    */
  private[graft] def cpus: String =
    sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Bench.cpus
    val sfName = sfDir.split('/').last
    // The Stages disk tier (cross-run persisted artifacts keyed on the
    // fixture fingerprint) is DISABLED for benchmarking: every bench
    // invocation must compute its stages from the parquet inputs, so
    // the timed evict+rebuild passes measure the real build — a
    // persisted artifact would turn the "rebuild" into a parquet read
    // and silently exclude the stage cost from the total (rounds
    // 14–18 under-reported stages this way; round 19 removed it). The
    // tier stays available to NON-measuring callers via the
    // graft.stage.dir system property.
    System.clearProperty("graft.stage.dir")
    // Same rule for staged FORMAT fixtures (the jsonl/orc/avro/warc
    // round-trip inputs, published once per fixture fingerprint):
    // wipe their roots so this invocation synthesizes them from the
    // parquet inputs itself. The one-time re-stage lands in each
    // consumer's first rep and min-of-k strips it, so figures are
    // unchanged — this just makes the run self-contained on disk.
    Seq("target/stages", "target/warc", "target/warc_web",
      "target/jsonl", "target/jsonl_zst", "target/orc", "target/avro")
      .foreach { p =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        try rm(new java.io.File(p)) catch { case _: Throwable => () }
      }
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
    // Sort by name: `queries` is a Map, so iteration order (and with
    // it cross-query interference) would otherwise shift whenever a
    // query is added — deterministic order makes rounds comparable.
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    if (new java.io.File(warmDir).isDirectory)
      named.foreach { case (_, fn) =>
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
    // Page-cache warm of the TARGET sf bytes: queries time in sorted
    // name order, so without this the agg_* family (alphabetically
    // first, all scanning the biggest table) absorbs whatever cold-IO
    // state the machine starts in — a per-machine constant charged to
    // arbitrary queries. Reading the files through the OS once makes
    // run 1 and run N start from the same cache state.
    locally {
      val buf = new Array[Byte](1 << 20)
      def touch(f: java.io.File): Unit =
        if (f.isDirectory) f.listFiles().foreach(touch)
        else {
          val in = new java.io.FileInputStream(f)
          try { while (in.read(buf) >= 0) () }
          finally in.close()
        }
      try touch(new java.io.File(sfDir))
      catch { case _: Throwable => () }
    }
    // Shared memoized stages (the near-dup component labels) are built
    // once per (session, dir) and reused by several queries. Build and
    // time them HERE, explicitly, so the one-time cost is accounted as
    // its own line item instead of being charged to whichever consumer
    // query happens to run first (which made that query look 100×
    // slower than its marginal cost). The stage build is one-shot and
    // memoized, so min-of-reps needs an explicit evict+rebuild —
    // stageReps of them (default 2), keeping the min like every query.
    val stageReps = sys.env.get("SPARK_GRAFT_STAGE_REPS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .getOrElse(2).max(1)
    // Expectations (committed same-code pair figures) — loaded before
    // the stage block so BOTH stages and queries get the ambient
    // outlier-retry below.
    val expectPath = sys.env.getOrElse("SPARK_GRAFT_EXPECT",
      "bench_expect.json")
    val expect: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(expectPath)), "UTF-8")
        "\"([^\"]+)\"\\s*:\\s*([0-9.]+)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    // Trigger widened 1.4x+0.12 -> 1.3x+0.08 (round 16): the round-15
    // driver record carried 14 s of ambient smear spread across 40+
    // rows that each sat BETWEEN the two thresholds — individually
    // small, collectively the whole driver-vs-clean gap. A genuinely
    // regressed query still only costs bounded extra samples (its
    // slower figure stands), and expectations are refolded from
    // same-code runs every round so the rule tracks the current code.
    // The absolute component is 0.08 s (not 0.10): the first r16 run
    // showed rows like ts_ewma at 0.17 vs 0.07 committed — 2.4×
    // inflated — sitting exactly ON the old > 0.10 boundary and
    // never re-sampled. 0.08 is still above the box's ~0.05 s
    // per-row ambient band, so an on-expectation row cannot flap.
    def overExpect(name: String, best: Double): Boolean =
      expect.get(name).exists(e => best > 1.3 * e && best - e > 0.08)
    // retry transparency: every expectation- or spread-triggered
    // re-sample is RECORDED in the emitted JSON (per-query extra-rep
    // counts + stage pass total), so downstream comparisons can see
    // which figures had extra samples behind them instead of trusting
    // a stderr note that no archive keeps. The protocol itself is
    // deliberately one-sided (re-sample only when slower than the
    // committed same-code figure, keep the min): min-of-k is the
    // estimator everywhere because ambient noise on a shared box is
    // strictly additive — a "lucky fast" run is the plan's true cost,
    // not an outlier to regress away — so the record, not symmetry,
    // is what keeps the protocol honest.
    var stagePasses = 1
    val (stageBest0, stageErrs) =
      try {
        var best = graft.queries.ExtensionQueries
          .prebuildStages(spark, sfDir).toMap
        // stageReps baseline passes, plus up to 2 extra full passes
        // while any stage sits above its committed expectation — the
        // same ambient-recovery discipline as the per-query retry
        // (stages are all-or-nothing to rebuild, so the retry is a
        // full evict+rebuild pass, bounded)
        var pass = 2
        while (pass <= stageReps ||
            (pass <= stageReps + 2 &&
              best.exists { case (k, v) => overExpect(k, v) })) {
          graft.queries.ExtensionQueries.evictStages(spark, sfDir)
          graft.queries.ExtensionQueries.prebuildStages(spark, sfDir)
            .foreach { case (k, v) =>
              best = best.updated(k, math.min(v, best.getOrElse(k, v)))
            }
          stagePasses = pass
          pass += 1
        }
        (best, Seq.empty[(String, String)])
      } catch {
        // a swallowed prebuild failure would let the stage cost slip
        // out of the total unnoticed (the first consumer rebuilds it,
        // min-of-k strips it) — surface it in the errors map
        case e: Throwable =>
          (Map.empty[String, Double],
            Seq("_stage_prebuild" -> s"${e.getClass.getSimpleName}: ${
              Option(e.getMessage).getOrElse("").takeWhile(_ != '\n')
                .take(160)}"))
      }
    var stageBest = stageBest0
    // A failed query must surface as an error, never masquerade as a
    // (fast!) timing — errors are reported per query in the JSON line,
    // and the process exits NONZERO after printing it (an error round
    // must not be recordable as a clean official total).
    // Each query runs `reps` times and reports the MIN: plan + codegen
    // caches make re-runs cheap, and the min strips shared-JVM noise
    // (GC from prior queries, scheduler backlog) that inflated single
    // samples 3–6× over isolated runs.
    val reps = sys.env.get("SPARK_GRAFT_REPS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .getOrElse(5).max(1)
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
             k: Int): (Double, Double, Option[String]) = {
      var best = Double.MaxValue
      var worst = 0.0
      var err: Option[String] = None
      var r = 0
      while (r < k && err.isEmpty) {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          // only successful reps compete for the min: a fast FAILURE
          // (0.3s to an exception) must not shadow a real 4s timing
          val dt = (System.nanoTime() - t0) / 1e9
          best = best.min(dt); worst = worst.max(dt)
        } catch {
          case e: Throwable =>
            err = Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage)
              .getOrElse("").takeWhile(_ != '\n').take(160)}")
            // no successful rep: report the failed rep's elapsed time
            // rather than Double.MaxValue garbage (the error entry
            // marks it untrustworthy either way)
            if (best == Double.MaxValue)
              best = (System.nanoTime() - t0) / 1e9
        }
        r += 1
      }
      (best, worst, err)
    }
    val firstPass = named.map { case (name, fn) =>
      val (best, worst, err) = time(fn, reps)
      (name, fn, best, worst, err)
    }
    // Outlier retry: ambient machine state (another process, a GC
    // storm) can straddle one query's entire rep window and survive
    // the min. Detect and re-sample LATER in the process, when the
    // interference has usually passed; every reported figure is still
    // a real measured run, just the min over more samples where the
    // noise was most expensive. Expectations come from the committed
    // same-code pair figures (bench_expect.json); a query without one
    // (or with no file at all) falls back to the spread rule: a
    // worst/best ratio ≥ 3 across reps is interference by definition
    // (the plan and data did not change between reps).
    //
    // Threshold history: 3x+0.15 (r13) -> 1.4x+0.12 (r14, 16 rows sat
    // between the rules, ~4 s of the 44-vs-36.6 s gap) -> 1.3x+0.08 +
    // multi-sweep (r16, see overExpect above) — each tightening paid
    // for by the refolded same-code expectations.
    val retryReps = sys.env.get("SPARK_GRAFT_RETRY_REPS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .getOrElse(3).max(1)
    // Retries run in SWEEPS (round 16; was one sweep): a sweep visits
    // every still-suspicious query once, so consecutive samples of
    // the same query are separated by the rest of the sweep — minutes
    // apart, not milliseconds — which is exactly the spacing an
    // interference burst that straddled the original rep window needs
    // to have passed. Round 15's single sweep retried 41 rows 3 reps
    // each IMMEDIATELY and recovered almost nothing (the burst was
    // still live); bounded extra sweeps re-sample only what is still
    // above its committed expectation. The spread rule (no committed
    // expectation) stays one-shot — without an absolute yardstick a
    // second sweep would chase its own min forever.
    val retrySweeps = sys.env.get("SPARK_GRAFT_RETRY_SWEEPS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .getOrElse(3).max(1)
    var cur = firstPass.map { case (n, f, b, w, e) => (n, f, b, w, e, 0) }
    var sweep = 1
    var anyFlagged = true
    while (sweep <= retrySweeps && anyFlagged) {
      def suspicious(n: String, b: Double, w: Double,
                     e: Option[String]): Boolean =
        e.isEmpty && (if (expect.contains(n)) overExpect(n, b)
        else sweep == 1 && w >= 3.0 * b && b >= 0.05)
      anyFlagged = cur.exists { case (n, _, b, w, e, _) =>
        suspicious(n, b, w, e) }
      if (anyFlagged) {
        cur = cur.map { case t @ (n, f, b, w, e, r) =>
          if (!suspicious(n, b, w, e)) t
          else {
            val (b2, _, e2) = time(f, retryReps)
            val merged = if (e2.isEmpty) math.min(b, b2) else b
            System.err.println(f"[bench] retried $n (sweep $sweep): " +
              f"$b%.2f -> $merged%.2f s (expected ${
                expect.getOrElse(n, -1.0)}%.2f)" +
              e2.fold("")(err => s" RETRY FAILED: $err"))
            // an errored retry contributed ZERO samples to the figure
            // — recording its reps would claim extra sampling that
            // never informed it (the field exists to be trusted)
            (n, f, merged, w, e, r + (if (e2.isEmpty) retryReps else 0))
          }
        }
        sweep += 1
      }
    }
    val results = cur.map { case (n, _, b, _, e, r) => (n, b, e, r) }
    // LATE stage retry: stages build (and exhaust their bounded early
    // retries) FIRST in the process, so a loud start inflates the
    // whole stage tier with no later chance to recover — run 4 of the
    // r16 protocol validation showed 8 stage rows carrying ~1.5 s of
    // exactly this. After the query sweeps — minutes later, when the
    // burst has usually passed — give still-over stages up to 2 more
    // evict+rebuild passes. A late-pass FAILURE only forfeits the
    // extra samples (the early passes already produced good figures),
    // so it is noted on stderr, never recorded as a bench error.
    var latePass = 0
    while (latePass < 2 && stageErrs.isEmpty &&
        stageBest.exists { case (k, v) => overExpect(k, v) }) {
      try {
        graft.queries.ExtensionQueries.evictStages(spark, sfDir)
        graft.queries.ExtensionQueries.prebuildStages(spark, sfDir)
          .foreach { case (k, v) =>
            stageBest = stageBest.updated(k,
              math.min(v, stageBest.getOrElse(k, v)))
          }
        stagePasses += 1
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] late stage retry failed " +
            s"(${e.getClass.getSimpleName}); keeping earlier figures")
          latePass = 2
      }
      latePass += 1
    }
    val stages = stageBest.toSeq.sortBy(_._1)
    def jstr(s: String): String =
      s.flatMap {
        case '\\' => "\\\\"
        case '"' => "\\\""
        case c if c < ' ' => "\\u%04x".format(c.toInt)
        case c => c.toString
      }.mkString("\"", "", "\"")
    // The harness keeps only the LAST ~2k chars of output, so the line
    // puts the headline fields AFTER the per-query map, sorted
    // fastest-first so the slowest — most informative — queries sit
    // nearest the end of the line. At the current ~125-query surface
    // the full line EXCEEDS 2k chars: the fastest queries' figures
    // fall off the front of the captured tail, the headline fields
    // survive because they print last, and the COMPLETE record is
    // also written to target/bench_<sf>.json below so no analysis
    // ever depends on the truncated stdout capture.
    // Locale.ROOT: the f interpolator uses the JVM default locale, and
    // a comma-decimal locale would emit invalid JSON. Per-query times
    // print at 2 decimals; the total keeps 3.
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def sec2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.sortBy(_._2)
      .map { case (k, v, _, _) => jstr(k) + ":" + sec2(v) }
      .mkString("{", ",", "}")
    val errs = (stageErrs.map { case (k, e) => jstr(k) + ":" + jstr(e) } ++
      results.collect { case (k, _, Some(e), _) => jstr(k) + ":" + jstr(e) })
      .mkString("{", ",", "}")
    // queries whose figure had expectation/spread-triggered extra
    // samples behind it, with the extra-rep count — the JSON record
    // of the retry protocol (stderr notes don't survive archiving)
    val retriedJson = results.collect { case (k, _, _, r) if r > 0 =>
      jstr(k) + ":" + r }.mkString("{", ",", "}")
    val stagesJson = stages
      .map { case (k, v) => jstr(k) + ":" + sec2(v) }
      .mkString("{", ",", "}")
    // Total = per-query mins + the one-time shared-stage builds, so
    // the memoized work is still paid for in the headline number.
    val total = results.map(_._2).sum + stages.map(_._2).sum
    val line = s"""{"queries":$qs,"errors":$errs,"stages":$stagesJson,"retried":$retriedJson,"stage_passes":$stagePasses,"reps":$reps,"sf":"$sfName","n":${results.size},"unit":"sec","metric":"total","value":${sec(total)}}"""
    println(line)
    // Durable copy: stdout goes through a harness that keeps only a
    // ~2k-char tail, so the full record is also written to a file —
    // round-over-round comparisons read this, never the capture.
    try {
      val out = java.nio.file.Paths.get("target", s"bench_$sfName.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, line.getBytes("UTF-8"))
      System.err.println(s"[bench] full record written to $out")
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] could not write record file: $e")
    }
    spark.stop()
    // Exit nonzero on ANY query/stage error — after the JSON line and
    // the durable record file are already written, so diagnostics
    // survive, but the wrapper records the round as failed instead of
    // archiving a total that silently excludes broken queries.
    val nErr = stageErrs.size + results.count(_._3.isDefined)
    if (nErr > 0) {
      System.err.println(s"[bench] $nErr queries errored; exiting 1")
      sys.exit(1)
    }
  }
}
