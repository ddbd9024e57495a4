package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** 1× → 10× → 100× growth-exponent measurement (dev tool): times the
  * heavy shared stages (`cc_labels`, `pr_graph`, `shingle_pairs`) and
  * their flagship consumers (`dedup_substring`, `curate_pretrain`,
  * `dedup_ngram_jaccard`, `graph_pagerank`) at three data tiers —
  * sf0.1 as 1×, the replica-scaled 10× and 100× fixtures
  * ([[ScaleFixtures]]) — and reports the measured scaling exponent
  * α = log₁₀(t_next / t_prev) per hop. α ≈ 1 is linear; the plan
  * audits (PlanSpec) argue no stage is super-linear BY CONSTRUCTION,
  * this run pins it BY MEASUREMENT, the last evidence the "plans
  * you'd want at 100×" story needs.
  *
  * Also instruments `shingle_pairs`' run-to-run spread (historically
  * 8.2–18.2 s at 10×) with per-run task/shuffle telemetry: if shuffle
  * bytes and summed task time are stable while wall varies, the
  * spread is ambient (scheduling/IO/GC), not data skew; if max-task
  * or summed task time moves with the wall, it is skew (hot posting
  * lists). Writes SF10_SMOKE.md.
  *
  * Stage timings are FRESH builds: the memo is evicted before every
  * rep, so each sample pays the full build, never a checkpoint read.
  */
object ScaleExponents {

  /** Per-run task telemetry collected off SparkListenerTaskEnd. */
  private final class TaskProbe extends SparkListener {
    val durs = ArrayBuffer.empty[Long] // ms
    var shufRead = 0L
    var shufWrite = 0L
    var gcMs = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      synchronized {
        val m = t.taskMetrics
        if (m != null) {
          durs += t.taskInfo.duration
          shufRead += m.shuffleReadMetrics.remoteBytesRead +
            m.shuffleReadMetrics.localBytesRead
          shufWrite += m.shuffleWriteMetrics.bytesWritten
          gcMs += m.jvmGCTime
        }
      }
    def reset(): Unit = synchronized {
      durs.clear(); shufRead = 0; shufWrite = 0; gcMs = 0
    }
    def snapshot: (Int, Double, Double, Double, Double, Long, Long) =
      synchronized {
        val d = durs.toArray.sorted
        val sum = d.map(_.toDouble).sum / 1000.0
        val max = if (d.isEmpty) 0.0 else d.last / 1000.0
        val p50 = if (d.isEmpty) 0.0 else d(d.length / 2) / 1000.0
        (d.length, sum, max, p50, gcMs / 1000.0, shufRead, shufWrite)
      }
  }

  private def fmtB(b: Long): String =
    if (b >= (1L << 30)) f"${b / (1024.0 * 1024 * 1024)}%.2f GiB"
    else f"${b / (1024.0 * 1024)}%.1f MiB"

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val probeRuns = args.lift(2).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probe = new TaskProbe
    spark.sparkContext.addSparkListener(probe)

    ScaleFixtures.ensure(spark, srcDir, "target/sf1", 10)
    ScaleFixtures.ensure(spark, srcDir, "target/sf10", 100)

    val tiers = Seq(("1x", srcDir), ("10x", "target/sf1"),
      ("100x", "target/sf10"))
    val queries = Seq("dedup_substring", "curate_pretrain",
      "dedup_ngram_jaccard", "graph_pagerank",
      // round-14 touched operators: the Bloom literal fold + staged
      // fingerprint store, the block-key spread (identity on these
      // multi-split fixtures — the row pins that), and the fused
      // small-budget LPA regime
      "dedup_incremental_bloom", "dedup_editdist", "graph_lpa",
      // round-15 touched operators: the join-free segment-explode
      // LOCF resample (one exchange; grid rows scale with the span
      // union) and the IVF-PQ twins off the shared ADC candidate
      // stage (fixed 50-query probe against a growing corpus — the
      // stage build inside rep 1 is the scan-bounded part)
      "ts_resample_locf", "sim_ivfpq_topk", "sim_ivfpq_refine_topk",
      // round-16 touched operator: zorder16 gained the out-of-range
      // raise_error guard — map-side projection over events, the row
      // pins that the guard branch stays scan-bounded (no exchange)
      "layout_zorder",
      // round-17 touched operators: the exchange-fusion batch —
      // q18's FD-fused single aggregate, the unmerged-census
      // multi-histogram MAD, the literal-centroid emit-once IVF
      // pairs, the first-matching-band emit-once simhash join, the
      // key-array-carrying LSH bands (the one fusion that TRADES
      // band-shuffle bytes for the dropped pair-distinct — watch its
      // exponent), and the min-label curate finish
      "tpch_q18", "ts_anomaly", "dedup_cosine_ivf",
      "dedup_simhash_pairs", "dedup_minhash_lsh", "curate_images")

    // results(name)(tier) = (repTimes, rows)
    val results =
      scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.LinkedHashMap[
          String, (Seq[Double], Long)]]
    def put(name: String, tier: String, ts: Seq[Double],
            rows: Long): Unit =
      results.getOrElseUpdate(name,
          scala.collection.mutable.LinkedHashMap.empty)
        .put(tier, (ts, rows))

    // shingle probe rows: (tier, run, wall, tasks, sumTask, maxTask,
    // p50Task, gc, shufRead, shufWrite, rows)
    val probeRows = ArrayBuffer.empty[(String, Int, Double, Int,
      Double, Double, Double, Double, Long, Long, Long)]

    for ((tier, dir) <- tiers) {
      val stages = graft.queries.ExtensionQueries
        .scaleTargetStages(spark, dir)
      for ((name, build) <- stages) {
        var rows = 0L
        val ts = (1 to reps).map { _ =>
          graft.ext.Stages.evict(spark, s"$dir|$name")
          val t0 = System.nanoTime()
          rows = build().count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[scale] $tier%-5s stage $name%-14s " +
          f"${ts.map(t => f"$t%.2f").mkString("/")} s rows=$rows")
        put(s"stage $name", tier, ts, rows)
      }
      // queries run against BUILT stages (the bench protocol): the
      // stage builds above leave the memo warm for the finishes.
      // Materialize via toRdd.count(), NOT df.count(): count() builds
      // a new Aggregate plan in which Catalyst may eliminate
      // row-preserving joins (graph_pagerank's rank joins vanish
      // entirely, timing a node count instead of PageRank) — toRdd
      // executes the query's own plan, every operator included.
      for (name <- queries) {
        val q = SparkEntry.queries(name)
        var rows = 0L
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          rows = q(spark, dir).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[scale] $tier%-5s query $name%-14s " +
          f"${ts.map(t => f"$t%.2f").mkString("/")} s rows=$rows")
        put(name, tier, ts, rows)
      }
      // df-cap sensitivity at 100x: the replica fixture puts every
      // cross-replica shingle above maxDf=64, so the production cap
      // suppresses the whole replica family as boilerplate (pair
      // output collapses, cost stays scan-bounded — the cap doing
      // its at-scale job). This row re-runs the SAME build with the
      // cap scaled by the replica factor (64·10), re-admitting the
      // cross-replica posting lists, to pin the pair-GENERATION cost
      // the capped row doesn't exercise.
      //
      // OPT-IN (arg 4 = "withUncapped") because the result is a
      // NEGATIVE one, measured twice on 2026-08-14: at 100x a df-6
      // base shingle is a df-600 posting list, cap 640 re-admits
      // ~10^5 such lists (~2·10^5 pairs each, ~10^10 candidate pair
      // rows), and the pair-count hash aggregate exhausted BOTH a
      // 12 GiB heap (executor OOM, exit 52) and a 96 GiB heap
      // (101 GiB RSS, kswapd thrash, killed at 15 min). That is the
      // point: the cap is the pair-VOLUME governor that keeps the
      // operator feasible at any scale; what it drops is only
      // df>cap boilerplate shingles. See SF10_SMOKE.md.
      if (tier == "100x" && args.lift(3).contains("withUncapped")) {
        var rows = 0L
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          rows = graft.ext.DedupOps.pairIntersections(
            graft.sources.Tables.load(spark, dir, "documents"),
            Seq("lang", "source"), org.apache.spark.sql.functions
              .col("doc_id"),
            graft.ext.TextAnalysis.shingleHashes(
              org.apache.spark.sql.functions.col("text"), 2),
            maxDf = 640).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[scale] $tier%-5s stage shingle_pairs(maxDf=640) " +
          f"${ts.map(t => f"$t%.2f").mkString("/")} s rows=$rows")
        put("stage shingle_pairs(maxDf=640)", tier, ts, rows)
      }
      // shingle_pairs spread probe at the 10x tier (the tier the
      // historical 2.2x spread was recorded at), with telemetry
      if (tier == "10x") {
        for (run <- 1 to probeRuns) {
          graft.ext.Stages.evict(spark, s"$dir|shingle_pairs")
          Thread.sleep(1000) // drain listener bus before reset
          probe.reset()
          val t0 = System.nanoTime()
          val rows = graft.queries.ExtensionQueries
            .scaleTargetStages(spark, dir)
            .collectFirst { case ("shingle_pairs", b) => b }.get
            .apply().count()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(1000) // let async task-end events land
          val (n, sum, max, p50, gc, sr, sw) = probe.snapshot
          println(f"[scale] probe run $run: wall=$wall%.2f s " +
            f"tasks=$n sum=$sum%.1f max=$max%.2f p50=$p50%.2f " +
            f"gc=$gc%.1f read=${fmtB(sr)} write=${fmtB(sw)}")
          probeRows += ((tier, run, wall, n, sum, max, p50, gc, sr,
            sw, rows))
        }
      }
    }

    // ---- report --------------------------------------------------
    val sb = new StringBuilder
    sb ++= "# SF10 scale exponents (1x -> 10x -> 100x)\n\n"
    sb ++= s"Replica-scaled tiers of sf0.1 (`graft.ScaleFixtures`): " +
      s"10x = 50k docs / 6M lineitem, 100x = 500k docs / 60M " +
      s"lineitem. local[32], min-of-$reps fresh builds per stage " +
      s"(memo evicted each rep), ${java.time.LocalDate.now()}. " +
      "alpha = log10 of the time ratio per 10x data hop; 1.0 is " +
      "linear, <1 sub-linear (fixed overheads amortizing), >1 " +
      "super-linear.\n\n"
    sb ++= "| stage/query | 1x s | 10x s | 100x s | a(1->10) | " +
      "a(10->100) | rows 1x | rows 10x | rows 100x |\n"
    sb ++= "|---|---|---|---|---|---|---|---|---|\n"
    for ((name, byTier) <- results) {
      def best(t: String) = byTier.get(t).map(_._1.min)
      def rows(t: String) = byTier.get(t).map(_._2)
      val (t1, t10, t100) = (best("1x"), best("10x"), best("100x"))
      def alpha(a: Option[Double], b: Option[Double]) = (for {
        x <- a; y <- b if x > 0
      } yield f"${math.log10(y / x)}%.2f").getOrElse("—")
      sb ++= s"| `$name` | ${t1.fold("—")(t => f"$t%.2f")} | " +
        s"${t10.fold("—")(t => f"$t%.2f")} | " +
        s"${t100.fold("—")(t => f"$t%.2f")} | " +
        s"${alpha(t1, t10)} | ${alpha(t10, t100)} | " +
        s"${rows("1x").fold("—")(_.toString)} | " +
        s"${rows("10x").fold("—")(_.toString)} | " +
        s"${rows("100x").fold("—")(_.toString)} |\n"
    }
    sb ++= "\n## shingle_pairs run-to-run spread (10x, fresh builds)\n\n"
    sb ++= "| run | wall s | tasks | sum task s | max task s | " +
      "p50 task s | gc s | shuffle read | shuffle write |\n"
    sb ++= "|---|---|---|---|---|---|---|---|---|\n"
    for ((_, run, wall, n, sum, max, p50, gc, sr, sw, _) <- probeRows)
      sb ++= f"| $run | $wall%.2f | $n | $sum%.1f | $max%.2f | " +
        f"$p50%.2f | $gc%.1f | ${fmtB(sr)} | ${fmtB(sw)} |\n"
    if (probeRows.nonEmpty) {
      val walls = probeRows.map(_._3)
      val sums = probeRows.map(_._5)
      sb ++= f"\nwall spread ${walls.max / walls.min}%.2fx; " +
        f"summed-task-time spread ${sums.max / sums.min}%.2fx; " +
        "shuffle bytes per run as tabled. If wall varies while " +
        "summed task time and shuffle bytes hold, the spread is " +
        "ambient (scheduler/IO/GC), not data skew.\n"
    }
    // preserve hand-written analysis below the marker (same contract
    // as SF1_SMOKE.md)
    val marker = "<!-- MANUAL ANALYSIS -->"
    val path = java.nio.file.Paths.get("SF10_SMOKE.md")
    val manual =
      if (java.nio.file.Files.exists(path)) {
        val prev = new String(
          java.nio.file.Files.readAllBytes(path), "UTF-8")
        val i = prev.indexOf(marker)
        if (i >= 0) prev.substring(i) else s"$marker\n"
      } else s"$marker\n"
    sb ++= "\n" + manual
    java.nio.file.Files.write(path, sb.toString.getBytes("UTF-8"))
    println("[scale] wrote SF10_SMOKE.md")
    spark.stop()
  }
}
