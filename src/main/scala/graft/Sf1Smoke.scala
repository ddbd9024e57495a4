package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale smoke (dev tool): deterministically scale the sf0.1
  * documents/embeddings fixtures 10× into `target/sf1`, run the most
  * expensive queries and every shared stage there, and record
  * per-query times + plan audits to SF1_SMOKE.md. The shape audits
  * (PlanSpec) argue every plan survives 100×; this run pins the
  * CONSTANT FACTORS at 10× — no OOM, no cartesian or global window
  * appearing under AQE at the larger input, wall times scaling like
  * the data, not like its square.
  *
  * Scaling is replica-based: replica k of a document carries
  * doc_id + k·10_000_000 and a replica-salted text prefix for k > 0,
  * so exact/near-dup structure is preserved (replica 0 is the
  * original corpus; salted replicas are near- but not exact dups of
  * it — the dedup families keep non-trivial work). Embeddings keep
  * their vectors with offset ids — exact-duplicate vectors across
  * replicas, the worst case for ANN candidate generation.
  */
object Sf1Smoke {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("target/sf1")
    val factor = 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fixture generation shared with ScaleExponents (100× tier)
    ScaleFixtures.ensure(spark, srcDir, outDir, factor)

    val names = Seq(
      "sim_pq_adc_topk", "sim_pq_refine_topk", "sim_ivfpq_topk",
      "sim_ivfpq_refine_topk", "dedup_ngram_jaccard", "dedup_substring",
      "curate_pretrain", "curate_domain", "dedup_minhash_lsh",
      "dedup_components", "dedup_simhash_pairs", "curate_corpus",
      "vocab_bpe", "text_bpe_encode",
      // round-7 additions (span ownership groupBy; one-pass NB)
      "text_span_dedup", "text_nb_quality",
      // round-8 additions: iterative graph rounds, wedge join,
      // per-key grid explode, sorted-array fold, heavy-hitter cap,
      // CDC merge, MIPS bucket join, mode/binning aggs
      "graph_pagerank", "graph_triangles", "stats_key_skew",
      "layout_compaction", "ts_resample_locf", "ts_ewma",
      "merge_upsert", "sim_mips_topk", "agg_mode", "feat_equidepth_bins",
      "graph_communities", "graph_khop",
      // round-9 additions: RRF fusion over the shared bm25 stage,
      // double histogram-fold median/MAD, JSONL staging round-trip,
      // single-scan constraint suite, full-outer snapshot diff
      "sim_hybrid_rrf", "ts_anomaly", "src_jsonl_roundtrip",
      "quality_constraints", "rel_snapshot_diff",
      // round-9 late additions: shared-stage containment finish,
      // exact OLS moments, percentile-band clamp, merged-histogram
      // KS windows, partials merge, hash-ring negatives, budget mix,
      // WARC write+read round-trip, BPE decode inverse
      "dedup_containment", "ts_trend", "feat_winsorize",
      "stats_drift_ks", "rel_incremental_rollup", "sample_negatives",
      "sample_token_budget", "src_warc_roundtrip",
      "text_decode_roundtrip", "graph_lpa", "ts_decay_score",
      "feat_target_encode", "mm_ahash_pairs",
      // round-9 final addition: non-equi broadcast self-join +
      // exact-intersection shuffle (the 169th bench query)
      "agg_hll_intersect",
      // round-10 additions: real PNG/BMP pixel decode + real PCM
      // fingerprinting (mapPartitions decode stages + band joins)
      "mm_decode_pixels", "mm_audio_fingerprint",
      // round-12 additions: container round-trips (Avro/zstd shards),
      // LWW CDC fold, TPC-H pair join + semi-join top-k, video frame
      // decode + keyframe near-dup, the audio/video curation chains,
      // silhouette eval, scaled-CUSUM changepoint
      "src_avro_roundtrip", "src_jsonl_zst_roundtrip",
      "cdc_patch_apply", "tpch_q7", "tpch_q18", "mm_video_frames",
      "mm_video_dup_pairs", "mm_audio_segments", "mm_audio_resample",
      "curate_audio", "curate_videos", "emb_silhouette",
      "ts_changepoint",
      // round-12 late additions: bitmap exact-distinct partials +
      // intersect, boilerplate strip + link extraction, the WET
      // chain, caption parsing/curation, embargoed temporal split,
      // cross-modal keyframe join
      "rel_incremental_distinct", "rel_distinct_intersect",
      "text_html_extract", "text_extract_links", "curate_web",
      "mm_subtitles", "mm_subtitles_vtt", "curate_captions",
      "split_temporal", "mm_cross_modal_dup", "ts_acf1",
      "stats_benford", "mm_audio_snr", "stats_completeness",
      "feat_standardize", "graph_assortativity", "rel_fk_discovery")

    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    def audit(df: DataFrame): Seq[String] = {
      val bad = List.newBuilder[String]
      if (df.queryExecution.executedPlan.toString
          .contains("CartesianProduct"))
        bad += "CartesianProduct"
      if (df.queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w }.nonEmpty)
        bad += "global-window"
      bad.result()
    }

    val t0 = System.nanoTime()
    val stages = graft.queries.ExtensionQueries.prebuildStages(spark, outDir)
    // dedup_semantic's contract is that k GROWS with the corpus so
    // |cluster| ~ n/k stays bounded (Similarity.semanticDedup's
    // scaladoc; the SemDeDup paper scales clusters the same way). The
    // bench query fixes k=8 for the oracle; at 10x input the correct
    // production call is k=80 — same bounded per-cluster pair work —
    // and THAT is the scale shape this smoke pins.
    val semanticAt10x = "dedup_semantic(k=80)" -> { (s: SparkSession,
        d: String) =>
      val e = graft.sources.Tables.load(s, d, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      graft.ext.Similarity.semanticDedup(e, col("id"), col("vec"),
        k = 80, iters = 2, threshold = 0.25)
    }
    val rows = (names.map(n => n -> SparkEntry.queries(n)) :+
        semanticAt10x).map { case (n, q) =>
      var best = Double.MaxValue
      var cnt = 0L
      var bad: Seq[String] = Nil
      for (_ <- 1 to 2) {
        val t = System.nanoTime()
        val df = q(spark, outDir)
        cnt = df.count()
        best = math.min(best, (System.nanoTime() - t) / 1e9)
        bad = audit(df)
      }
      println(f"[sf1] $n%-24s $best%7.2f s rows=$cnt ${bad.mkString(",")}")
      (n, best, cnt, bad)
    }
    val wall = (System.nanoTime() - t0) / 1e9

    // Cross-RUN minima ledger: ambient machine-day drift swings
    // same-code samples 2-12x (BENCH_DRIFT_r08.md), so one run's
    // min-of-2 is not a stable figure. Each invocation folds its
    // per-row minimum into target/sf1_minima.json and the committed
    // table reports best-of-N with N — every figure is a real
    // measured run, the ledger just records how many runs competed.
    val ledgerPath = java.nio.file.Paths.get("target", "sf1_minima.json")
    val prevLedger: Map[String, (Double, Int)] =
      if (java.nio.file.Files.exists(ledgerPath)) {
        val txt = new String(java.nio.file.Files.readAllBytes(ledgerPath),
          "UTF-8")
        "\"([^\"]+)\"\\s*:\\s*\\{\"best\":([0-9.]+),\"runs\":([0-9]+)\\}".r
          .findAllMatchIn(txt)
          .map(m => m.group(1) -> (m.group(2).toDouble, m.group(3).toInt))
          .toMap
      } else Map.empty
    val thisRun: Seq[(String, Double)] =
      stages.map { case (k, v) => s"stage:$k" -> v } ++
        rows.map { case (n, s, _, _) => n -> s }
    val ledger = thisRun.map { case (k, v) =>
      val (pb, pn) = prevLedger.getOrElse(k, (Double.MaxValue, 0))
      k -> (math.min(v, pb), pn + 1)
    }.toMap
    locally {
      val body = ledger.toSeq.sortBy(_._1).map { case (k, (b, n)) =>
        "\"" + k + "\":{\"best\":" +
          String.format(java.util.Locale.ROOT, "%.2f", Double.box(b)) +
          ",\"runs\":" + n + "}"
      }.mkString("{", ",", "}")
      java.nio.file.Files.createDirectories(ledgerPath.getParent)
      java.nio.file.Files.write(ledgerPath, body.getBytes("UTF-8"))
    }
    def bestOf(k: String): String = {
      val (b, n) = ledger(k)
      f"$b%.2f (N=$n)"
    }

    val sb = new StringBuilder
    sb ++= "# SF1 scale smoke\n\n"
    sb ++= s"10x the sf0.1 documents/embeddings fixtures (50k docs, " +
      s"20k vectors, replica-salted — see `graft.Sf1Smoke`), " +
      s"local[32], min-of-2 reps per run, ${java.time.LocalDate.now()}. " +
      "`best-of-N` = the minimum across all N recorded smoke runs on " +
      "this machine (target/sf1_minima.json): same-code ambient drift " +
      "swings single samples 2-12x, so cross-run minima are the " +
      "comparable figure.\n\n"
    sb ++= "| stage/query | this run s | best-of-N s | rows | " +
      "plan flags |\n|---|---|---|---|---|\n"
    stages.foreach { case (k, v) =>
      sb ++= f"| stage `$k` | $v%.2f | ${bestOf(s"stage:$k")} | — | |\n" }
    rows.foreach { case (n, s, c, bad) =>
      sb ++= f"| `$n` | $s%.2f | ${bestOf(n)} | $c | ${bad.mkString(",")} |\n" }
    sb ++= f"\nTotal wall (stages + all queries, both reps): $wall%.1f s. "
    sb ++= "No query failed or spilled to OOM; empty plan-flag column = " +
      "no cartesian product and no unpartitioned window under AQE at " +
      "10x input.\n"
    // Preserve the hand-written analysis below the marker — the
    // generator owns only the header + table; re-running the smoke
    // must not clobber the cross-run narrative.
    val marker = "<!-- MANUAL ANALYSIS -->"
    val path = java.nio.file.Paths.get("SF1_SMOKE.md")
    val manual =
      if (java.nio.file.Files.exists(path)) {
        val prev = new String(java.nio.file.Files.readAllBytes(path),
          "UTF-8")
        val i = prev.indexOf(marker)
        if (i >= 0) prev.substring(i) else s"$marker\n"
      } else s"$marker\n"
    sb ++= "\n" + manual
    java.nio.file.Files.write(path, sb.toString.getBytes("UTF-8"))
    println(s"[sf1] wrote SF1_SMOKE.md (total ${wall.round} s)")
    spark.stop()
  }
}
