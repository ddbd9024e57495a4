package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{UserAgg, UserEvent}

/** Structured Streaming specs: the batch event-time operators run
  * unchanged under readStream (MemoryStream source, memory sink).
  */
class StreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumblingCounts aggregates a stream incrementally") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = StreamOps.tumblingCounts(
      in.toDF().toDF("ts", "event_type", "value"), "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode(OutputMode.Complete).start()
    try {
      in.addData((ts("2024-01-01 10:05:00"), "click", 1.5))
      in.addData((ts("2024-01-01 10:55:00"), "click", 2.5),
        (ts("2024-01-01 11:05:00"), "view", 4.0))
      q.processAllAvailable()
      val got = spark.table("tumbling_out")
        .select($"wstart", $"event_type", $"n", $"sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(got === Set(
        (ts("2024-01-01 10:00:00"), "click", 2L, 4.0),
        (ts("2024-01-01 11:00:00"), "view", 1L, 4.0)))
    } finally q.stop()
  }

  test("ohlcStream matches the batch ohlcBars bar-for-bar under " +
      "shuffled multi-batch delivery, including tied timestamps") {
    implicit val sq = spark.sqlContext
    val rows = Seq(
      ("m", ts("2024-01-01 10:00:05"), 2.5, 1L),
      ("m", ts("2024-01-01 10:20:00"), 9.0, 2L),
      ("m", ts("2024-01-01 10:59:59"), 1.25, 3L),
      ("m", ts("2024-01-01 11:30:00"), 4.0, 4L),
      ("m", ts("2024-01-01 11:30:00"), 3.0, 5L), // tie: id orders it
      ("n", ts("2024-01-01 10:10:00"), -1.0000005, 6L))
    val in = MemoryStream[(String, Timestamp, Double, Long)]
    val q = StreamOps.ohlcStream(
        in.toDF().toDF("key", "ts", "value", "tie"),
        watermark = "10 minutes", bucket = "1 hour")
      .writeStream.format("memory").queryName("ohlc_out")
      .outputMode(OutputMode.Complete).start()
    try {
      // adversarial delivery: reversed order, split mid-bucket
      val shuffled = rows.reverse
      in.addData(shuffled.take(2)); q.processAllAvailable()
      in.addData(shuffled.slice(2, 5)); q.processAllAvailable()
      in.addData(shuffled.drop(5)); q.processAllAvailable()
      val got = spark.table("ohlc_out")
        .as[(String, Timestamp, Long, Long, Long, Long, Long, Long)]
        .collect().toSet
      val want = graft.ext.TimeSeries.ohlcBars(
          rows.toDF("key", "ts", "value", "event_id"),
          bucketSeconds = 3600, tie = col("event_id"))
        .as[(String, Timestamp, Long, Long, Long, Long, Long, Long)]
        .collect().toSet
      assert(got === want)
      assert(want.size === 3)
    } finally q.stop()
  }

  test("runningUserCounts keeps per-key state across batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[UserEvent]
    val q = StreamOps.runningUserCounts(in.toDS())
      .writeStream.format("memory").queryName("state_out")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(UserEvent(1L, ts("2024-01-01 10:00:00"), "click"))
      q.processAllAvailable()
      in.addData(UserEvent(1L, ts("2024-01-01 11:00:00"), "view"),
        UserEvent(2L, ts("2024-01-01 10:30:00"), "click"))
      q.processAllAvailable()
      val last = spark.table("state_out").as[UserAgg].collect()
        .groupBy(_.user_id).map { case (u, rows) =>
          u -> rows.maxBy(_.n_events)
        }
      assert(last(1L).n_events === 2L)
      assert(last(1L).last_ts === ts("2024-01-01 11:00:00"))
      assert(last(2L).n_events === 1L)
    } finally q.stop()
  }

  test("dedupWithinWatermark drops duplicate keys") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val q = StreamOps.dedupWithinWatermark(
      in.toDF().toDF("ts", "event_id"), "1 hour", Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts("2024-01-01 10:00:00"), 1L),
        (ts("2024-01-01 10:01:00"), 1L),
        (ts("2024-01-01 10:02:00"), 2L))
      q.processAllAvailable()
      val got = spark.table("dedup_out").select($"event_id")
        .as[Long].collect().sorted
      assert(got.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("simhashNearDupCandidates flags near signatures across batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val q = StreamOps.simhashNearDupCandidates(
      in.toDF().toDF("doc_id", "simhash"))
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append).start()
    try {
      val sig = 0x0123456789ABCL & ((1L << 60) - 1)
      in.addData((1L, sig))
      q.processAllAvailable()
      // doc 2: same signature except one low bit -> hamming 1, must
      // match doc 1 in every band whose key is unchanged (3 of 4);
      // doc 3: a far signature -> no pair
      in.addData((2L, sig ^ 1L), (3L, ~sig & ((1L << 60) - 1)))
      q.processAllAvailable()
      val got = spark.table("neardup_out")
        .as[StreamOps.NearDup].collect()
      assert(got.nonEmpty)
      assert(got.forall(d => d.doc_id == 2L && d.dup_of == 1L
        && d.hamming == 1))
      assert(got.map(_.band).toSet === Set(1, 2, 3)) // band 0 key differs
      // at-least-once replay: redelivering every doc must emit ZERO
      // new pairs — a replayed doc's pairs already went out on its
      // first delivery
      in.addData((1L, sig), (2L, sig ^ 1L),
        (3L, ~sig & ((1L << 60) - 1)))
      q.processAllAvailable()
      assert(spark.table("neardup_out").count() === got.length.toLong)
    } finally q.stop()
  }

  test("simhashNearDupCandidates masks Hamming to the SIGNATURE " +
      "bits: garbage above bit 60 must not reject a pair the bands " +
      "found (batch hammingDistance(a, b, bits) parity)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val q = StreamOps.simhashNearDupCandidates(
      in.toDF().toDF("doc_id", "simhash"))
      .writeStream.format("memory").queryName("neardup_mask_out")
      .outputMode(OutputMode.Append).start()
    try {
      val sig = 0x0123456789ABCL & ((1L << 60) - 1)
      // doc 2 carries the identical low-60 signature with all four
      // top bits set: unmasked XOR reads hamming 4 > maxHamming 3
      // and silently drops the strongest possible near-dup
      in.addData((1L, sig))
      q.processAllAvailable()
      in.addData((2L, sig | (0xFL << 60)))
      q.processAllAvailable()
      val got = spark.table("neardup_mask_out")
        .as[StreamOps.NearDup].collect()
      assert(got.nonEmpty, "identical-signature pair lost to unmasked bits")
      assert(got.forall(d => d.hamming == 0))
      assert(got.map(_.band).toSet === Set(0, 1, 2, 3))
    } finally q.stop()
  }

  test("ewmaStream drops NULL key/ts/value events (the batch " +
      "ewmaFixed policy) instead of poison-pilling the query on the " +
      "typed encoder") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Option[Long], Option[Timestamp],
      Option[Long], Option[Double])]
    val q = StreamOps.ewmaStream(
      in.toDF().toDF("key", "ts", "tie", "value"))
      .writeStream.format("memory").queryName("ewma_null_out")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      val t1 = Timestamp.valueOf("2024-01-01 00:01:00")
      val t2 = Timestamp.valueOf("2024-01-01 00:02:00")
      in.addData(
        (Some(1L), Some(t0), Some(1L), Some(4.0)),
        (Some(1L), Some(t1), Some(2L), None),        // NULL value
        (None, Some(t1), Some(3L), Some(9.0)),       // NULL key
        (Some(1L), None, Some(4L), Some(9.0)),       // NULL ts
        (Some(1L), Some(t2), Some(5L), Some(2.0)))
      q.processAllAvailable()
      val got = spark.table("ewma_null_out")
        .as[StreamOps.EwmaPoint].collect().sortBy(_.n_events)
      // fold over [4.0, 2.0] only: 4e6 then (4e6 + 2e6) div 2 = 3e6
      assert(got.map(p => (p.n_events, p.ewma_micros)).toSeq ===
        Seq((1L, 4000000L), (2L, 3000000L)))
    } finally q.stop()
  }

  test("aHash/audio streaming twins: banded near-dup over binary " +
    "signatures matches the batch pass, across micro-batches") {
    implicit val sq = spark.sqlContext
    import graft.ext.{DedupOps, Multimodal, PixelEncoder, WavEncoder}
    def bright(cells: Set[(Int, Int)])(x: Int, y: Int) = {
      val p = if (cells((x, y))) 255 else 10
      (p << 16) | (p << 8) | p
    }
    // ids 1/2: one raster through TWO container formats (exact dups);
    // id 4 (later batch): hamming-1 neighbor; id 3: far signature
    // sharing only all-zero bands (candidate killed by the verify)
    val a = bright(Set((0, 0), (1, 0))) _
    val near = bright(Set((0, 0), (1, 0), (2, 0))) _
    val far = bright(Set((8, 5), (9, 5))) _
    val firstBatch = Seq(
      (1L, PixelEncoder.png(10, 6, a)),
      (2L, PixelEncoder.bmp(10, 6, a)),
      (3L, PixelEncoder.png(10, 6, far)))
    val lateBatch = Seq((4L, PixelEncoder.png(10, 6, near)))
    def norm(p: (Long, Long)) =
      (math.min(p._1, p._2), math.max(p._1, p._2))
    // batch reference: the SAME blobs through the batch pass
    val batchPairs = DedupOps.simhashBandPairs(
        Multimodal.aHashImages((firstBatch ++ lateBatch)
          .toDF("doc_id", "blob"), $"doc_id", $"blob"),
        $"id", $"ahash", bands = 4, bitsPerBand = 15, maxHamming = 3,
        bits = 60)
      .select($"id_a", $"id_b", $"hamming")
      .as[(Long, Long, Int)].collect()
      .map(r => (norm((r._1, r._2)), r._3)).toSet
    assert(batchPairs.map(_._1) === Set((1L, 2L), (1L, 4L), (2L, 4L)))
    val in = MemoryStream[(Long, Array[Byte])]
    val q = StreamOps.aHashNearDupCandidates(
      in.toDF().toDF("doc_id", "blob"))
      .writeStream.format("memory").queryName("mm_neardup_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(firstBatch: _*)
      q.processAllAvailable()
      in.addData(lateBatch: _*)
      q.processAllAvailable()
      val got = spark.table("mm_neardup_out")
        .as[StreamOps.NearDup].collect()
        .map(d => (norm((d.doc_id, d.dup_of)), d.hamming)).toSet
      assert(got === batchPairs) // pair set AND hamming agree
    } finally q.stop()
    // dHash twin: same blobs through the gradient signature — the
    // exact-dup pair (1, 2) must survive, batch equivalence pinned
    val batchD = DedupOps.simhashBandPairs(
        Multimodal.dHashImages((firstBatch ++ lateBatch)
          .toDF("doc_id", "blob"), $"doc_id", $"blob"),
        $"id", $"dhash", bands = 3, bitsPerBand = 18, maxHamming = 2,
        bits = 54)
      .select($"id_a", $"id_b", $"hamming")
      .as[(Long, Long, Int)].collect()
      .map(r => (norm((r._1, r._2)), r._3)).toSet
    assert(batchD.map(_._1).contains((1L, 2L)))
    val inD = MemoryStream[(Long, Array[Byte])]
    val qD = StreamOps.dHashNearDupCandidates(
      inD.toDF().toDF("doc_id", "blob"))
      .writeStream.format("memory").queryName("mm_dhashdup_out")
      .outputMode(OutputMode.Append).start()
    try {
      inD.addData(firstBatch: _*)
      qD.processAllAvailable()
      inD.addData(lateBatch: _*)
      qD.processAllAvailable()
      val gotD = spark.table("mm_dhashdup_out")
        .as[StreamOps.NearDup].collect()
        .map(d => (norm((d.doc_id, d.dup_of)), d.hamming)).toSet
      assert(gotD === batchD)
    } finally qD.stop()
    // pHash twin: 32×32 payloads through the DCT signature, batch
    // equivalence with the cross-format exact dup
    def big(cells: Set[(Int, Int)])(x: Int, y: Int) = {
      val p = if (cells((x / 8, y / 8))) 220 else 30
      (p << 16) | (p << 8) | p
    }
    val pa = big(Set((0, 0), (1, 1))) _
    val pfar = big(Set((2, 3), (3, 2))) _
    val pBlobs = Seq(
      (21L, PixelEncoder.png(32, 32, pa)),
      (22L, PixelEncoder.bmp(32, 32, pa)),
      (23L, PixelEncoder.png(32, 32, pfar)))
    val batchP = DedupOps.simhashBandPairs(
        Multimodal.pHashImages(pBlobs.toDF("doc_id", "blob"),
          $"doc_id", $"blob"),
        $"id", $"phash", bands = 3, bitsPerBand = 21, maxHamming = 2,
        bits = 63)
      .select($"id_a", $"id_b", $"hamming")
      .as[(Long, Long, Int)].collect()
      .map(r => (norm((r._1, r._2)), r._3)).toSet
    assert(batchP.map(_._1).contains((21L, 22L)))
    val inP = MemoryStream[(Long, Array[Byte])]
    val qP = StreamOps.pHashNearDupCandidates(
      inP.toDF().toDF("doc_id", "blob"))
      .writeStream.format("memory").queryName("mm_phashdup_out")
      .outputMode(OutputMode.Append).start()
    try {
      inP.addData(pBlobs.take(2): _*)
      qP.processAllAvailable()
      inP.addData(pBlobs.drop(2): _*)
      qP.processAllAvailable()
      val gotP = spark.table("mm_phashdup_out")
        .as[StreamOps.NearDup].collect()
        .map(d => (norm((d.doc_id, d.dup_of)), d.hamming)).toSet
      assert(gotP === batchP)
    } finally qP.stop()
    // audio: same machinery over WAV payloads — exact-dup impulse
    // pair plus a hamming-2 cross pair, batch equivalence again.
    // Doc 13 is the SAME impulse in G.711 μ-law (code 0xF3 ≈ 96,
    // silence 0xFF = 0): the energy fingerprint is magnitude-scale-
    // free, so the μ-law member is an exact cross-CODING dup of the
    // PCM impulse. Doc 14 routes an IMA ADPCM payload through the
    // same streaming decode (its quantizer tail smears the impulse
    // across early windows, so it pairs with nothing — what matters
    // is that stream and batch agree on that too).
    val impA = Array.fill(120)(0); impA(0) = 100
    val impB = Array.fill(120)(0); impB(119) = 100
    val muA = Array.fill(120)(0xFF); muA(0) = 0xF3
    val wavs = Seq((10L, WavEncoder.pcm16(impA)),
      (11L, WavEncoder.pcm16(impA)), (12L, WavEncoder.pcm16(impB)),
      (13L, WavEncoder.g711(muA, tag = 7)),
      (14L, WavEncoder.imaAdpcm(impA, blockSamples = 121)))
    val batchAudio = DedupOps.simhashBandPairs(
        Multimodal.audioFingerprints(wavs.toDF("doc_id", "blob"),
          $"doc_id", $"blob"),
        $"id", $"afp", bands = 4, bitsPerBand = 15, maxHamming = 3,
        bits = 60)
      .select($"id_a", $"id_b", $"hamming")
      .as[(Long, Long, Int)].collect()
      .map(r => (norm((r._1, r._2)), r._3)).toSet
    val in2 = MemoryStream[(Long, Array[Byte])]
    val q2 = StreamOps.audioNearDupCandidates(
      in2.toDF().toDF("doc_id", "blob"))
      .writeStream.format("memory").queryName("mm_audiodup_out")
      .outputMode(OutputMode.Append).start()
    try {
      in2.addData(wavs.take(2): _*)
      q2.processAllAvailable()
      in2.addData(wavs.drop(2): _*)
      q2.processAllAvailable()
      val got2 = spark.table("mm_audiodup_out")
        .as[StreamOps.NearDup].collect()
        .map(d => (norm((d.doc_id, d.dup_of)), d.hamming)).toSet
      assert(got2 === batchAudio)
      assert(got2.map(_._1).contains((10L, 11L))) // the exact dup
      // the μ-law member IS a cross-coding dup of the PCM impulse
      assert(got2.map(_._1).contains((10L, 13L)))
    } finally q2.stop()
  }

  test("intervalJoin pairs rows in the time range, across batches") {
    implicit val sq = spark.sqlContext
    val imps = MemoryStream[(Timestamp, Long, String)]
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val q = StreamOps.intervalJoin(
      imps.toDF().toDF("ts", "user_id", "imp"),
      clicks.toDF().toDF("ts", "user_id", "click"),
      key = "user_id", lowerBound = "0 seconds", upperBound = "30 minutes",
      watermark = "1 hour")
      .select($"left_imp", $"right_click")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode(OutputMode.Append).start()
    try {
      imps.addData((ts("2024-01-01 10:00:00"), 1L, "i1"),
        (ts("2024-01-01 10:00:00"), 2L, "i2"))
      q.processAllAvailable()
      clicks.addData(
        (ts("2024-01-01 10:10:00"), 1L, "c-in"),      // in range
        (ts("2024-01-01 10:50:00"), 1L, "c-late"),    // past 30 min
        (ts("2024-01-01 09:50:00"), 2L, "c-before"),  // before the imp
        (ts("2024-01-01 10:29:00"), 3L, "c-nokey"))   // no such imp
      q.processAllAvailable()
      val got = spark.table("ij_out").as[(String, String)].collect().toSet
      assert(got === Set(("i1", "c-in")))
    } finally q.stop()
  }

  test("streaming intervalJoin equals its batch twin on the same input") {
    // the equivalence contract behind the ew_interval_join oracle row:
    // the SAME intervalJoin call on batch frames (watermark no-op) and
    // on streams (any batch split) yields identical row sets
    implicit val sq = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val rows: Seq[(Timestamp, Long, String)] = (0 until 40).map { i =>
      (new Timestamp(ts("2024-01-01 08:00:00").getTime +
        rnd.nextInt(4 * 3600) * 1000L), (i % 5).toLong, s"e$i")
    }
    val (lRows, rRows) = rows.splitAt(20)
    def batchDf(s: Seq[(Timestamp, Long, String)]) =
      s.toDF("ts", "user_id", "tag")
    val want = StreamOps.intervalJoin(batchDf(lRows), batchDf(rRows),
      key = "user_id", lowerBound = "0 seconds",
      upperBound = "45 minutes", watermark = "2 hours")
      .select($"left_tag", $"right_tag")
      .as[(String, String)].collect().toSet
    assert(want.nonEmpty) // a vacuous equivalence would prove nothing
    val lIn = MemoryStream[(Timestamp, Long, String)]
    val rIn = MemoryStream[(Timestamp, Long, String)]
    val q = StreamOps.intervalJoin(
      lIn.toDF().toDF("ts", "user_id", "tag"),
      rIn.toDF().toDF("ts", "user_id", "tag"),
      key = "user_id", lowerBound = "0 seconds",
      upperBound = "45 minutes", watermark = "2 hours")
      .select($"left_tag", $"right_tag")
      .writeStream.format("memory").queryName("ij_eq_out")
      .outputMode(OutputMode.Append).start()
    try {
      lIn.addData(lRows.take(12)); rIn.addData(rRows.take(7))
      q.processAllAvailable()
      lIn.addData(lRows.drop(12)); rIn.addData(rRows.drop(7))
      q.processAllAvailable()
      val got = spark.table("ij_eq_out")
        .as[(String, String)].collect().toSet
      assert(got === want)
    } finally q.stop()
  }

  test("streaming simhash twin equals batch band pairs on the same input") {
    // the equivalence contract: same (doc_id, simhash) rows, any
    // batch split -> the streaming candidates (normalized to
    // unordered pairs, deduped across bands) are exactly the batch
    // simhashBandPairs output
    implicit val sq = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val mask60 = (1L << 60) - 1
    val base = Seq.fill(12)(rnd.nextLong() & mask60)
    val docs: Seq[(Long, Long)] =
      base.zipWithIndex.map { case (s, i) => (i.toLong, s) } ++ Seq(
        100L -> (base(0) ^ 1L),                        // hamming 1
        101L -> (base(3) ^ (1L << 17) ^ (1L << 40)),   // hamming 2
        102L -> base(7))                               // exact dup
    val batch = graft.ext.DedupOps.simhashBandPairs(
        docs.toDF("doc_id", "simhash"), $"doc_id", $"simhash",
        bands = 4, bitsPerBand = 15, maxHamming = 3, bits = 60)
      .as[(Long, Long, Int)].collect().toSet
    assert(batch.size === 3) // the planted pairs, no accidental ones
    val in = MemoryStream[(Long, Long)]
    val q = StreamOps.simhashNearDupCandidates(
      in.toDF().toDF("doc_id", "simhash"))
      .writeStream.format("memory").queryName("simhash_eq_out")
      .outputMode(OutputMode.Append).start()
    try {
      val (b1, rest) = docs.splitAt(5)
      val (b2, b3) = rest.splitAt(6)
      Seq(b1, b2, b3).foreach { b =>
        in.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("simhash_eq_out")
        .as[StreamOps.NearDup].collect()
        .map(d => (math.min(d.doc_id, d.dup_of),
          math.max(d.doc_id, d.dup_of), d.hamming))
        .toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming funnel: a late final step cannot complete against " +
    "a chain mate from its own future; replayed docs don't self-pair") {
    implicit val sq = spark.sqlContext
    // click arrives first (batch 1) at 10:00; a LATE purchase with
    // event time 09:00 arrives in batch 2 — its chain mate would be
    // in its future, so no hit may be emitted
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val q = StreamOps.funnelStream(
      in.toDF().toDF("key", "ts", "tie", "etype"),
      steps = Seq("click", "purchase"),
      withinMicros = 3600L * 1000000L)
      .writeStream.format("memory").queryName("funnel_late_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, ts("2024-01-01 10:00:00"), 1L, "click"))
      q.processAllAvailable()
      in.addData((1L, ts("2024-01-01 09:00:00"), 2L, "purchase"))
      q.processAllAvailable()
      assert(spark.table("funnel_late_out").count() === 0)
      // an in-window purchase after the click still completes
      in.addData((1L, ts("2024-01-01 10:30:00"), 3L, "purchase"))
      q.processAllAvailable()
      assert(spark.table("funnel_late_out").count() === 1)
    } finally q.stop()
    // simhash twin: an at-least-once redelivery must not self-pair
    val sIn = MemoryStream[(Long, Long)]
    val sq2 = StreamOps.simhashNearDupCandidates(
      sIn.toDF().toDF("doc_id", "simhash"))
      .writeStream.format("memory").queryName("simhash_replay_out")
      .outputMode(OutputMode.Append).start()
    try {
      sIn.addData((7L, 12345L)); sq2.processAllAvailable()
      sIn.addData((7L, 12345L)); sq2.processAllAvailable() // replay
      assert(spark.table("simhash_replay_out").count() === 0)
    } finally sq2.stop()
  }

  test("streaming packer equals the batch packer when chunks arrive " +
    "in order; state carries across batches") {
    // the equivalence contract: per-shard arrival order = the batch
    // packer's (doc_id, chunk_idx) order -> identical sequence
    // assignments, even when the stream is split mid-shard so the
    // running token count must survive in keyed state
    implicit val sq = spark.sqlContext
    val docs = (1L to 9L).map(i =>
      (i, (0 until (3 + (i % 4).toInt)).map(j => s"w${i}_$j")
        .mkString(" "))).toDF("doc_id", "text")
    val chunks = graft.ext.TextAnalysis.chunkTokens(docs, $"doc_id",
      $"text", window = 2, overlap = 0)
    val want = graft.ext.TextAnalysis.packSequences(chunks, $"doc_id",
      $"chunk_idx", $"n_tokens", capacity = 5, shards = 3,
      salt = "spec-pack:")
      .as[(Long, Int, Long, Long, Long, Long)].collect().toSet
    assert(want.map(_._5).size > 1) // crosses sequence boundaries
    val ordered = chunks
      .select($"doc_id", $"chunk_idx", $"n_tokens")
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, Long)].collect()
    val in = MemoryStream[(Long, Int, Long)]
    val q = StreamOps.packSequencesStream(
      in.toDF().toDF("doc_id", "chunk_idx", "n_tokens"),
      capacity = 5, shards = 3, salt = "spec-pack:")
      .writeStream.format("memory").queryName("pack_eq_out")
      .outputMode(OutputMode.Append).start()
    try {
      // split mid-stream: later batches must resume from stored cums
      val (b1, b2) = ordered.splitAt(ordered.length / 2)
      Seq(b1, b2).foreach { b => in.addData(b.toSeq); q.processAllAvailable() }
      val got = spark.table("pack_eq_out")
        .as[(Long, Int, Long, Long, Long, Long)].collect().toSet
      assert(got === want)
    } finally q.stop()
  }

  test("streaming funnel equals the batch funnel for in-order " +
    "arrival; chain state survives the batch split") {
    implicit val sq = spark.sqlContext
    // same scenario family as the batch funnel spec: clean chains,
    // wrong order, missing steps, stale gaps, revalidating signups
    val evs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "signup"),
      (1L, ts("2024-01-01 01:00:00"), 2L, "click"),
      (1L, ts("2024-01-01 02:00:00"), 3L, "purchase"),
      (2L, ts("2024-01-01 00:00:00"), 4L, "signup"),
      (2L, ts("2024-01-01 02:00:00"), 5L, "purchase"),
      (2L, ts("2024-01-01 03:00:00"), 6L, "click"),
      (3L, ts("2024-01-01 01:00:00"), 7L, "click"),
      (3L, ts("2024-01-01 02:00:00"), 8L, "purchase"),
      (4L, ts("2024-01-01 00:00:00"), 9L, "signup"),
      (4L, ts("2024-01-02 01:00:00"), 10L, "signup"),
      (4L, ts("2024-01-02 02:00:00"), 11L, "click"),
      (4L, ts("2024-01-02 03:00:00"), 12L, "purchase"),
      (4L, ts("2024-01-02 04:00:00"), 13L, "purchase"), // second hit
      (5L, ts("2024-01-01 00:00:00"), 14L, "signup"),
      (5L, ts("2024-01-01 01:00:00"), 15L, "click"),
      (5L, ts("2024-01-02 03:30:00"), 16L, "purchase"))
    val batchDf = evs.toDF("user_id", "ts", "event_id", "event_type")
    val want = graft.ext.EventWindows.funnel(batchDf, $"user_id", $"ts",
      $"event_id", $"event_type",
      steps = Seq("signup", "click", "purchase"), within = "1 day")
      .as[(Long, Long, Timestamp, Timestamp)].collect().toSet
    assert(want.map(_._2) === Set(3L, 12L, 13L))
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val q = StreamOps.funnelStream(
      in.toDF().toDF("key", "ts", "tie", "etype"),
      steps = Seq("signup", "click", "purchase"),
      withinMicros = 86400L * 1000000L)
      .writeStream.format("memory").queryName("funnel_eq_out")
      .outputMode(OutputMode.Append).start()
    try {
      // split in global time order so per-key arrival stays in order;
      // user 4's chain must survive the split in keyed state
      val ordered = evs.sortBy(e => (e._2.getTime, e._3))
      val (b1, b2) = ordered.splitAt(8)
      Seq(b1, b2).foreach { b => in.addData(b); q.processAllAvailable() }
      val got = spark.table("funnel_eq_out")
        .as[(Long, Long, Timestamp, Timestamp)].collect().toSet
      assert(got === want)
    } finally q.stop()
  }

  test("streaming simhash: the candidate-pair set is invariant under " +
    "adversarially shuffled micro-batch delivery") {
    // same docs as the equivalence test, but delivered in a seeded
    // random order across uneven batches: every bucket pair is still
    // compared exactly once (when its later-arriving member lands),
    // so the normalized pair set must equal the batch operator's
    implicit val sq = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val mask60 = (1L << 60) - 1
    val base = Seq.fill(12)(rnd.nextLong() & mask60)
    val docs: Seq[(Long, Long)] =
      base.zipWithIndex.map { case (s, i) => (i.toLong, s) } ++ Seq(
        100L -> (base(0) ^ 1L),
        101L -> (base(3) ^ (1L << 17) ^ (1L << 40)),
        102L -> base(7))
    val batch = graft.ext.DedupOps.simhashBandPairs(
        docs.toDF("doc_id", "simhash"), $"doc_id", $"simhash",
        bands = 4, bitsPerBand = 15, maxHamming = 3, bits = 60)
      .as[(Long, Long, Int)].collect().toSet
    val shuffled = new scala.util.Random(41).shuffle(docs)
    val in = MemoryStream[(Long, Long)]
    val q = StreamOps.simhashNearDupCandidates(
      in.toDF().toDF("doc_id", "simhash"))
      .writeStream.format("memory").queryName("simhash_shuf_out")
      .outputMode(OutputMode.Append).start()
    try {
      val (b1, rest) = shuffled.splitAt(4)
      val (b2, b3) = rest.splitAt(7)
      Seq(b1, b2, b3).foreach { b =>
        in.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("simhash_shuf_out")
        .as[StreamOps.NearDup].collect()
        .map(d => (math.min(d.doc_id, d.dup_of),
          math.max(d.doc_id, d.dup_of), d.hamming))
        .toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming funnel: arbitrary within-batch permutation matches " +
    "the batch funnel, and a full at-least-once replay re-emits nothing") {
    implicit val sq = spark.sqlContext
    val evs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "signup"),
      (1L, ts("2024-01-01 01:00:00"), 2L, "click"),
      (1L, ts("2024-01-01 02:00:00"), 3L, "purchase"),
      (2L, ts("2024-01-01 00:00:00"), 4L, "signup"),
      (2L, ts("2024-01-01 02:00:00"), 5L, "purchase"),
      (2L, ts("2024-01-01 03:00:00"), 6L, "click"),
      (4L, ts("2024-01-01 00:00:00"), 9L, "signup"),
      (4L, ts("2024-01-02 01:00:00"), 10L, "signup"),
      (4L, ts("2024-01-02 02:00:00"), 11L, "click"),
      (4L, ts("2024-01-02 03:00:00"), 12L, "purchase"),
      (4L, ts("2024-01-02 04:00:00"), 13L, "purchase"))
    val want = graft.ext.EventWindows.funnel(
      evs.toDF("user_id", "ts", "event_id", "event_type"),
      $"user_id", $"ts", $"event_id", $"event_type",
      steps = Seq("signup", "click", "purchase"), within = "1 day")
      .as[(Long, Long, Timestamp, Timestamp)].collect().toSet
    assert(want.map(_._2) === Set(3L, 12L, 13L))
    // one micro-batch, rows in a seeded random permutation: the
    // operator's (ts, tie) within-batch sort must make the emitted
    // set independent of delivery order
    val shuffled = new scala.util.Random(23).shuffle(evs)
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val q = StreamOps.funnelStream(
      in.toDF().toDF("key", "ts", "tie", "etype"),
      steps = Seq("signup", "click", "purchase"),
      withinMicros = 86400L * 1000000L)
      .writeStream.format("memory").queryName("funnel_shuf_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(shuffled); q.processAllAvailable()
      val got = spark.table("funnel_shuf_out")
        .as[(Long, Long, Timestamp, Timestamp)].collect().toSet
      assert(got === want)
      // at-least-once replay of the ENTIRE batch: chain updates are
      // idempotent (max) and the replay guard holds emission at the
      // newest emitted (ts, tie) per key — zero new rows
      in.addData(shuffled); q.processAllAvailable()
      assert(spark.table("funnel_shuf_out").count() === want.size)
    } finally q.stop()
  }

  test("streaming funnel replay guard: a genuinely LATE out-of-order " +
    "final step is suppressed — the documented divergence from the " +
    "batch funnel") {
    // The guard cannot distinguish an at-least-once redelivery from a
    // real conversion that arrives out of order BEHIND an already
    // emitted hit: both sit at-or-below the newest emitted (ts, tie).
    // The operator documents that it drops them (bound lateness with a
    // watermark upstream if they must count); this test pins the drop
    // so the batch-equivalence contract's exception is test-visible,
    // not just scaladoc-stated.
    implicit val sq = spark.sqlContext
    val early = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "signup"),
      (1L, ts("2024-01-01 01:00:00"), 2L, "click"),
      (1L, ts("2024-01-01 03:00:00"), 4L, "purchase"))
    // arrives AFTER the t=03:00 hit was emitted, but is event-timed
    // BEFORE it — the batch funnel counts it, the stream cannot
    val late = (1L, ts("2024-01-01 02:00:00"), 3L, "purchase")
    val batchHits = graft.ext.EventWindows.funnel(
      (early :+ late).toDF("user_id", "ts", "event_id", "event_type"),
      $"user_id", $"ts", $"event_id", $"event_type",
      steps = Seq("signup", "click", "purchase"), within = "1 day")
      .as[(Long, Long, Timestamp, Timestamp)].collect().toSet
    assert(batchHits.map(_._2) === Set(3L, 4L),
      "batch funnel must count BOTH purchases for the divergence to exist")
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val q = StreamOps.funnelStream(
      in.toDF().toDF("key", "ts", "tie", "etype"),
      steps = Seq("signup", "click", "purchase"),
      withinMicros = 86400L * 1000000L)
      .writeStream.format("memory").queryName("funnel_lff_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(early); q.processAllAvailable()
      in.addData(Seq(late)); q.processAllAvailable()
      val got = spark.table("funnel_lff_out")
        .as[(Long, Long, Timestamp, Timestamp)].collect().toSet
      assert(got.map(_._2) === Set(4L),
        "the late final step must be suppressed, the early hit kept")
    } finally q.stop()
  }

  test("streaming packer under shuffled delivery: every chunk packs " +
    "exactly once into a gapless per-shard token stream (the " +
    "documented arrival-order contract)") {
    implicit val sq = spark.sqlContext
    val docs = (1L to 9L).map(i =>
      (i, (0 until (3 + (i % 4).toInt)).map(j => s"w${i}_$j")
        .mkString(" "))).toDF("doc_id", "text")
    val chunks = graft.ext.TextAnalysis.chunkTokens(docs, $"doc_id",
      $"text", window = 2, overlap = 0)
      .select($"doc_id", $"chunk_idx", $"n_tokens")
      .as[(Long, Int, Long)].collect()
    val shuffled = new scala.util.Random(11).shuffle(chunks.toSeq)
    val in = MemoryStream[(Long, Int, Long)]
    val q = StreamOps.packSequencesStream(
      in.toDF().toDF("doc_id", "chunk_idx", "n_tokens"),
      capacity = 5, shards = 3, salt = "spec-pack:")
      .writeStream.format("memory").queryName("pack_shuf_out")
      .outputMode(OutputMode.Append).start()
    try {
      val (b1, rest) = shuffled.splitAt(shuffled.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        in.addData(b); q.processAllAvailable()
      }
      val got = spark.table("pack_shuf_out")
        .as[(Long, Int, Long, Long, Long, Long)].collect()
      // exactly once: every input chunk appears once
      assert(got.map(r => (r._1, r._2)).toSet ===
        chunks.map(c => (c._1, c._2)).toSet)
      assert(got.length === chunks.length)
      // gapless: per shard, the stream positions (seq_id·capacity +
      // seq_offset) sorted ascending are the exclusive prefix sums of
      // the chunk token counts — no hole, no overlap, regardless of
      // which arrival order produced them
      got.groupBy(_._4).foreach { case (_, rows) =>
        val byPos = rows.sortBy(r => r._5 * 5 + r._6)
        var expect = 0L
        byPos.foreach { r =>
          assert(r._5 * 5 + r._6 === expect,
            s"hole or overlap at shard ${r._4}")
          expect += r._3
        }
      }
    } finally q.stop()
  }

  test("redactPii and hash sampling run stateless on a stream") {
    // the corpus-curation scrub/downsample stage is a pure projection
    // + filter, so it streams with no watermark and no state store
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val src = in.toDF().toDF("doc_id", "text")
    val q = graft.ext.Sampling.stratifiedHashSample(
      src, $"doc_id", lit("en"), Map.empty, defaultRate = 100, salt = "s:")
      .select($"doc_id", graft.ext.TextAnalysis.redactPii($"text").as("t"))
      .writeStream.format("memory").queryName("scrub_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, "mail a@b.co now"), (2L, "plain"))
      q.processAllAvailable()
      val got = spark.table("scrub_out").as[(Long, String)].collect().toMap
      assert(got === Map(1L -> "mail <EMAIL> now", 2L -> "plain"))
    } finally q.stop()
    // the leakage-guarded split is equally stateless: the same hash
    // assigns the same split on a stream as in batch
    val sIn = MemoryStream[(Long, String)]
    val sq2 = graft.ext.Sampling.splitAssign(
      sIn.toDF().toDF("doc_id", "source"), $"source", "graft-split:",
      valPerMille = 100, testPerMille = 100)
      .writeStream.format("memory").queryName("split_stream_out")
      .outputMode(OutputMode.Append).start()
    try {
      sIn.addData((1L, "src1"), (2L, "src2"), (3L, "src1"))
      sq2.processAllAvailable()
      val got = spark.table("split_stream_out")
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      val want = graft.ext.Sampling.splitAssign(
        Seq((1L, "src1"), (2L, "src2"), (3L, "src1"))
          .toDF("doc_id", "source"),
        $"source", "graft-split:", 100, 100)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      assert(got === want)
      assert(got(1L) === got(3L)) // same source, same split — always
    } finally sq2.stop()
    // the Gopher quality gate is a map-only projection too: identical
    // verdicts on a stream as in batch, no state store
    val gIn = MemoryStream[(Long, String)]
    val gDocs = Seq(
      1L -> ("the quick brown fox and dog ran over it " * 4),
      2L -> "the of and it is")
    val gq = graft.ext.TextAnalysis.gopherRules(
      gIn.toDF().toDF("doc_id", "text"), $"doc_id", $"text",
      minWords = 10, maxWords = 1000)
      .select("doc_id", "fail_mask", "keep")
      .writeStream.format("memory").queryName("gopher_stream_out")
      .outputMode(OutputMode.Append).start()
    try {
      gIn.addData(gDocs: _*)
      gq.processAllAvailable()
      val got = spark.table("gopher_stream_out")
        .as[(Long, Int, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val want = graft.ext.TextAnalysis.gopherRules(
        gDocs.toDF("doc_id", "text"), $"doc_id", $"text",
        minWords = 10, maxWords = 1000)
        .select("doc_id", "fail_mask", "keep")
        .as[(Long, Int, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === want)
      assert(want(1L)._2 && !want(2L)._2) // the gate discriminates
    } finally gq.stop()
  }

  test("sessionCounts merges session windows across batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val q = StreamOps.sessionCounts(
      in.toDF().toDF("ts", "user_id"), "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Complete).start()
    try {
      in.addData((ts("2024-01-01 10:00:00"), 1L))
      in.addData((ts("2024-01-01 10:20:00"), 1L),  // merges into session 1
        (ts("2024-01-01 12:00:00"), 1L))           // new session
      q.processAllAvailable()
      val got = spark.table("sessions_out")
        .select($"user_id", $"session_start", $"n")
        .as[(Long, Timestamp, Long)].collect().toSet
      assert(got === Set(
        (1L, ts("2024-01-01 10:00:00"), 2L),
        (1L, ts("2024-01-01 12:00:00"), 1L)))
    } finally q.stop()
  }

  test("streaming EWMA: shuffled within-batch delivery matches the " +
    "batch fold, and a full at-least-once replay re-folds nothing") {
    implicit val sq = spark.sqlContext
    // two keys, five events each, values exercising the floor+div path
    val evs = for {
      k <- Seq(1L, 2L)
      (v, i) <- Seq(3.5, 1.25, 10.0, 0.000001, 7.75).zipWithIndex
    } yield (k, ts(f"2024-01-01 00:0$i:00"), i.toLong, v + k)
    val batch = graft.ext.TimeSeries.ewmaFixed(
        evs.toDF("key", "ts", "tie", "value"),
        tie = lit(0L)) // constant tie: ts is unique per key here
      .as[(Long, Long, Long)].collect()
      .map { case (k, n, e) => k -> ((n, e)) }.toMap
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    val q = StreamOps.ewmaStream(
        in.toDF().toDF("key", "ts", "tie", "value"))
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batches split mid-key-history; rows shuffled WITHIN each batch
      // (cross-batch order per key stays in ts order — the contract)
      val rnd = new scala.util.Random(13)
      val byTime = evs.sortBy(_._2.getTime)
      val (b1, b2) = byTime.splitAt(4)
      Seq(b1, b2).foreach { b =>
        in.addData(rnd.shuffle(b)); q.processAllAvailable()
      }
      val points = spark.table("ewma_out").as[StreamOps.EwmaPoint]
        .collect()
      // one point per folded event, and the newest point per key is
      // exactly the batch ewmaFixed row
      assert(points.length === evs.size)
      val finalByKey = points.groupBy(_.key)
        .map { case (k, ps) => k -> ps.maxBy(_.n_events) }
      for ((k, (n, e)) <- batch) {
        assert(finalByKey(k).n_events === n)
        assert(finalByKey(k).ewma_micros === e)
      }
      // at-least-once replay: redeliver EVERYTHING; the high-water
      // mark must drop every row — no new points, state unchanged
      in.addData(rnd.shuffle(byTime)); q.processAllAvailable()
      assert(spark.table("ewma_out").count() === evs.size.toLong)
    } finally q.stop()
  }

  test("streaming OLS trend: shuffled within-batch delivery matches " +
    "the batch moments bit-for-bit despite the different re-base " +
    "origin, and replay re-folds nothing") {
    implicit val sq = spark.sqlContext
    // key 2 rises, key 1 falls; negative values exercise the
    // truncation-toward-zero mean
    val evs = for {
      k <- Seq(1L, 2L)
      (v, i) <- Seq(3.5, -1.25, 10.0, -0.01, 7.75).zipWithIndex
    } yield (k, ts(f"2024-01-01 00:0$i:00"), i.toLong,
      if (k == 1L) -v else v)
    val batch = graft.ext.TimeSeries.linearTrendMicro(
        evs.toDF("key", "ts", "tie", "value").drop("tie"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)), r.getLong(3)))).toMap
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    val q = StreamOps.trendStream(
        in.toDF().toDF("key", "ts", "tie", "value"))
      .writeStream.format("memory").queryName("trend_out")
      .outputMode(OutputMode.Append).start()
    try {
      val rnd = new scala.util.Random(17)
      val byTime = evs.sortBy(_._2.getTime)
      val (b1, b2) = byTime.splitAt(4)
      Seq(b1, b2).foreach { b =>
        in.addData(rnd.shuffle(b)); q.processAllAvailable()
      }
      val points = spark.table("trend_out").as[StreamOps.TrendPoint]
        .collect()
      assert(points.length === evs.size)
      val finalByKey = points.groupBy(_.key)
        .map { case (k, ps) => k -> ps.maxBy(_.n) }
      for ((k, (n, s, m)) <- batch) {
        assert(finalByKey(k).n === n)
        assert(finalByKey(k).slope_micro.map(Long.box) === s)
        assert(finalByKey(k).mean_centi === m)
      }
      // a single mid-stream point has no x-variance yet → NULL slope
      assert(points.filter(_.n == 1).forall(_.slope_micro.isEmpty))
      // at-least-once replay: the high-water mark drops everything
      in.addData(rnd.shuffle(byTime)); q.processAllAvailable()
      assert(spark.table("trend_out").count() === evs.size.toLong)
    } finally q.stop()
  }

  test("streaming Misra-Gries: single-shard stream reproduces the " +
    "sequential batch fold; theorem bounds hold across batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[String]
    val q = StreamOps.freqItemsStream(in.toDF().toDF("item"),
      k = 2, shards = 1)
      .writeStream.format("memory").queryName("freq_out")
      .outputMode(OutputMode.Update).start()
    val b1 = Seq("a", "b", "c")
    val b2 = Seq("a", "a", "b")
    try {
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      val rows = spark.table("freq_out").as[StreamOps.FreqSummary]
        .collect()
      val n = (b1 ++ b2).size.toLong
      val fin = rows.filter(_.shard_n == n)
        .map(r => r.item -> r.est).toMap
      // same reduce, same order → identical summary content
      val mg = new graft.ext.FreqItemsAggregator(2)
      val want = (b1 ++ b2).foldLeft(Map.empty[String, Long])(mg.reduce)
      assert(fin === want)
      // the MG theorems on the final state: never over-counts, and
      // under-counts by at most n/(k+1)
      val exact = (b1 ++ b2).groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      fin.foreach { case (i, est) =>
        assert(est <= exact(i) && exact(i) - est <= n / 3)
      }
      // every heavy item (exact > n/(k+1)) is present
      exact.filter(_._2 > n / 3).keys
        .foreach(i => assert(fin.contains(i)))
    } finally q.stop()
  }

  test("exactly-once sink: committed batch ids skip on replay, " +
    "half-written attempts rewrite, and the streamed table equals " +
    "the input exactly once") {
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft-eos").toString
    val out = s"$root/table"
    // unit level: same id twice → one write; the redelivery (even
    // with DIFFERENT content, the at-least-once worst case) is a no-op
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(StreamOps.writeBatchIdempotent(b0, out, 0L))
    assert(!StreamOps.writeBatchIdempotent(
      Seq((9L, "z")).toDF("k", "v"), out, 0L))
    assert(spark.read.parquet(s"$out/batch_id=0")
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
    // crash mid-write: no _SUCCESS → the retry REPLACES the partial
    val dir1 = new java.io.File(out, "batch_id=1")
    dir1.mkdirs()
    b0.limit(1).write.mode("overwrite")
      .parquet(dir1.toString)
    new java.io.File(dir1, "_SUCCESS").delete()
    assert(StreamOps.writeBatchIdempotent(
      Seq((3L, "c")).toDF("k", "v"), out, 1L))
    assert(spark.read.parquet(dir1.toString)
      .as[(Long, String)].collect().toSeq === Seq((3L, "c")))
    // end to end: the sink lands each micro-batch once, partitioned
    // by batch_id, and the union equals everything streamed
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.exactlyOnceParquetSink(
      in.toDF().toDF("k", "v"), s"$root/stream",
      s"$root/ckpt")
    try {
      in.addData((10L, "x")); q.processAllAvailable()
      in.addData((11L, "y"), (12L, "z")); q.processAllAvailable()
      val got = spark.read.parquet(s"$root/stream")
        .select($"k", $"v").as[(Long, String)].collect().toSet
      assert(got === Set((10L, "x"), (11L, "y"), (12L, "z")))
      assert(spark.read.parquet(s"$root/stream")
        .select($"batch_id").distinct().count() === 2)
    } finally q.stop()
  }

  test("streaming Misra-Gries: multi-partition batches fold " +
    "deterministically (item-sorted within each micro-batch)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[String]
    // repartition(4) makes the shard group's iterator concatenate
    // shuffle-map outputs in nondeterministic fetch order — the
    // in-batch item sort is what pins WHICH valid MG summary comes out
    val q = StreamOps.freqItemsStream(
      in.toDF().toDF("item").repartition(4), k = 2, shards = 1)
      .writeStream.format("memory").queryName("freq_det_out")
      .outputMode(OutputMode.Update).start()
    val batch = Seq("d", "c", "b", "a", "c", "a")
    try {
      in.addData(batch); q.processAllAvailable()
      val n = batch.size.toLong
      val fin = spark.table("freq_det_out").as[StreamOps.FreqSummary]
        .collect().filter(_.shard_n == n)
        .map(r => r.item -> r.est).toMap
      val mg = new graft.ext.FreqItemsAggregator(2)
      val want = batch.sorted
        .foldLeft(Map.empty[String, Long])(mg.reduce)
      assert(fin === want)
    } finally q.stop()
  }

  test("streaming Misra-Gries: item-hash sharding keeps each item's " +
    "counters in one shard with per-shard stream lengths") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[String]
    val q = StreamOps.freqItemsStream(in.toDF().toDF("item"),
      k = 4, shards = 3)
      .writeStream.format("memory").queryName("freq_shard_out")
      .outputMode(OutputMode.Update).start()
    val items = Seq.tabulate(30)(i => s"w${i % 5}")
    try {
      in.addData(items.take(15)); q.processAllAvailable()
      in.addData(items.drop(15)); q.processAllAvailable()
      val rows = spark.table("freq_shard_out").as[StreamOps.FreqSummary]
        .collect()
      // an item never appears under two shards
      assert(rows.groupBy(_.item).forall(_._2.map(_.shard).distinct
        .size == 1))
      // final summaries: per shard, the newest shard_n; the shard
      // stream lengths partition the 30 items
      val fin = rows.groupBy(_.shard)
        .map { case (s, rs) => s -> rs.filter(
          _.shard_n == rs.map(_.shard_n).max) }
      assert(fin.values.map(_.head.shard_n).sum === 30L)
      // k=4 ≥ distinct-per-shard → every count is exact (no decrement
      // ever fires): 5 distinct items × 6 occurrences each
      val est = fin.values.flatten.map(r => r.item -> r.est).toMap
      assert(est === Seq.tabulate(5)(i => s"w$i" -> 6L).toMap)
    } finally q.stop()
  }

  test("audioSegments and HtmlText.extract run unchanged under " +
      "readStream: stateless decode/extract per micro-batch matches " +
      "batch") {
    import graft.ext.{HtmlText, Multimodal, WavEncoder}
    implicit val sq = spark.sqlContext
    val wavs = (0L until 6L).map(id => (id,
      WavEncoder.pcm16(Array.tabulate(40)(t =>
        ((id + 1) * (t * 37 + 11) % 512).toInt - 256))))
    val in = MemoryStream[(Long, Array[Byte])]
    val q = Multimodal.audioSegments(
        in.toDF().toDF("doc_id", "blob"), $"doc_id", $"blob", 128)
      .writeStream.format("memory").queryName("aseg_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(wavs.take(3)); q.processAllAvailable()
      in.addData(wavs.drop(3)); q.processAllAvailable()
      val got = spark.table("aseg_out")
        .as[(Long, Int, Int, Int, Long)].collect().toSet
      val want = Multimodal.audioSegments(wavs.toDF("doc_id", "blob"),
        $"doc_id", $"blob", 128)
        .as[(Long, Int, Int, Int, Long)].collect().toSet
      assert(got === want && want.nonEmpty)
    } finally q.stop()
    val pages = (0L until 4L).map(id =>
      (id, s"<p>doc $id <b>body</b> &amp; tail</p><script>x</script>"))
    val inH = MemoryStream[(Long, String)]
    val qH = inH.toDF().toDF("doc_id", "html")
      .select($"doc_id", HtmlText.extract($"html").as("x"))
      .writeStream.format("memory").queryName("hx_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(); inH.addData(pages: _*); qH.processAllAvailable()
      val got = spark.table("hx_out").as[(Long, String)].collect().toSet
      assert(got === pages.map { case (id, _) =>
        (id, s"doc $id body & tail") }.toSet)
    } finally qH.stop()
  }

  test("bitmapDistinctStream: exact per-key distinct counts converge " +
      "under shuffled delivery and duplicate replay") {
    import graft.streaming.StreamOps.{DistinctEvent, DistinctCount}
    implicit val sq = spark.sqlContext
    val r = new scala.util.Random(42)
    // key 1 crosses the 4096 array->bitmap promotion inside the
    // state; key 2 stays sparse; values repeat heavily
    val events = (1 to 12000).map(_ =>
      DistinctEvent(1L, r.nextInt(9000).toLong)) ++
      (1 to 50).map(_ => DistinctEvent(2L, r.nextInt(20).toLong))
    val want = events.groupBy(_.key).view
      .mapValues(_.map(_.value).toSet.size.toLong).toMap
    val in = MemoryStream[DistinctEvent]
    val q = StreamOps.bitmapDistinctStream(in.toDS())
      .writeStream.format("memory").queryName("bdist_out")
      .outputMode(OutputMode.Update).start()
    try {
      val shuffled = r.shuffle(events)
      in.addData(shuffled.take(5000)); q.processAllAvailable()
      in.addData(shuffled.drop(5000)); q.processAllAvailable()
      in.addData(shuffled.take(3000)); q.processAllAvailable() // replay
      val got = spark.table("bdist_out").as[DistinctCount].collect()
        .groupBy(_.key).view
        .mapValues(_.map(_.n_distinct).max).toMap
      assert(got === want)
    } finally q.stop()
  }

  test("videoNearDupCandidates: keyframe-hash banded near-dup over " +
      "MJPEG clips matches the batch pass across micro-batches") {
    implicit val sq = spark.sqlContext
    import graft.ext.{DedupOps, JpegEncoder, MjpegAvi, Multimodal}
    // 80x48 DC-only keyframes pool to the exact 10x6 block grid;
    // frame 1 is a decoy the stride-4 sampler never decodes
    def clip(cells: Set[(Int, Int)]): Array[Byte] = {
      def kf(bx: Int, by: Int) =
        (if (cells((bx, by))) 255 else 10) * 8 - 1024
      MjpegAvi.encode(Seq(
        JpegEncoder.grayDcOnly(80, 48, kf),
        JpegEncoder.grayDcOnly(80, 48, (_, _) => 0)), 80, 48, 33333)
    }
    val a = Set((0, 0), (1, 0))
    val blobs = Seq(
      (1L, clip(a)), (2L, clip(a)), // exact dup keyframes
      (3L, clip(Set((8, 5), (9, 5)))), // far
      (4L, clip(a + ((2, 0))))) // hamming-1 neighbor
    def norm(p: (Long, Long)) =
      (math.min(p._1, p._2), math.max(p._1, p._2))
    val batch = DedupOps.simhashBandPairs(
        Multimodal.videoKeyframeAHash(blobs.toDF("doc_id", "blob"),
          $"doc_id", $"blob", stride = 4),
        $"id", $"vhash", bands = 4, bitsPerBand = 15, maxHamming = 3,
        bits = 60)
      .select($"id_a", $"id_b", $"hamming")
      .as[(Long, Long, Int)].collect()
      .map(r => (norm((r._1, r._2)), r._3)).toSet
    assert(batch.map(_._1) === Set((1L, 2L), (1L, 4L), (2L, 4L)))
    val in = MemoryStream[(Long, Array[Byte])]
    val q = StreamOps.videoNearDupCandidates(
        in.toDF().toDF("doc_id", "blob"))
      .writeStream.format("memory").queryName("mm_videodup_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(blobs.take(3): _*); q.processAllAvailable()
      in.addData(blobs.drop(3): _*); q.processAllAvailable()
      val got = spark.table("mm_videodup_out")
        .as[StreamOps.NearDup].collect()
        .map(d => (norm((d.doc_id, d.dup_of)), d.hamming)).toSet
      assert(got === batch)
    } finally q.stop()
  }

  test("videoFrameStats runs unchanged under readStream: the map-only " +
      "frame sampling decodes each micro-batch exactly like batch") {
    import graft.ext.{JpegEncoder, MjpegAvi, Multimodal}
    implicit val sq = spark.sqlContext
    def clip(id: Long): Array[Byte] = {
      val n = ((id % 3) * 2 + 2).toInt
      MjpegAvi.encode((0 until n).map(f =>
        JpegEncoder.grayDcOnly(16, 8, (bx, _) =>
          ((id * 31 + f * 97 + bx * 53) % 256).toInt - 128)), 16, 8, 33333)
    }
    val blobs = (0L until 9L).map(id => (id, clip(id)))
    val in = MemoryStream[(Long, Array[Byte])]
    val q = Multimodal.videoFrameStats(
        in.toDF().toDF("doc_id", "blob"), stride = 2)
      .writeStream.format("memory").queryName("vframes_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(blobs.take(4)); q.processAllAvailable()
      in.addData(blobs.drop(4)); q.processAllAvailable()
      val got = spark.table("vframes_out")
        .as[(Long, Int, Int, Int, Int, Long, Int, Int)].collect().toSet
      val want = Multimodal.videoFrameStats(
          blobs.toDF("doc_id", "blob"), stride = 2)
        .as[(Long, Int, Int, Int, Int, Long, Int, Int)].collect().toSet
      assert(got === want)
      assert(want.map(_._1).size === 9)
    } finally q.stop()
  }

  test("patchApplyStream: per-column LWW converges under out-of-order " +
      "delivery and at-least-once replay, and matches the batch " +
      "patchApply fold") {
    import graft.streaming.StreamOps.{PatchEvent, PatchRow}
    implicit val sq = spark.sqlContext
    val events = Seq(
      PatchEvent(1L, 5L, Map("bal" -> "111")),
      PatchEvent(1L, 3L, Map("seg" -> "x")),
      PatchEvent(1L, 9L, Map.empty), // touches nothing, raises max_seq
      PatchEvent(2L, 1L, Map("bal" -> "20", "seg" -> "b")),
      PatchEvent(2L, 4L, Map("seg" -> "c")),
      PatchEvent(7L, 2L, Map("bal" -> "777")),
      PatchEvent(7L, 4L, Map("bal" -> "778")))
    val in = MemoryStream[PatchEvent]
    val q = StreamOps.patchApplyStream(in.toDS())
      .writeStream.format("memory").queryName("patch_out")
      .outputMode(OutputMode.Update).start()
    try {
      // adversarial delivery: HIGHEST seqs first (late stragglers
      // must retro-apply, not drop), then a full duplicate replay
      val desc = events.sortBy(-_.seq)
      in.addData(desc.take(3)); q.processAllAvailable()
      in.addData(desc.drop(3)); q.processAllAvailable()
      in.addData(events); q.processAllAvailable() // at-least-once
      val all = spark.table("patch_out").as[PatchRow].collect()
      // final state emission per key: max (max_seq, columns won)
      val got = all.groupBy(_.key).values
        .map(_.maxBy(r => (r.max_seq, r.values.size))).toSet
      assert(got === Set(
        PatchRow(1L, Map("bal" -> "111", "seg" -> "x"), 9L),
        PatchRow(2L, Map("bal" -> "20", "seg" -> "c"), 4L),
        PatchRow(7L, Map("bal" -> "778"), 4L)))
      // batch equivalence: the same changelog through
      // Relational.patchApply folds to the same overlay
      val patches = events.map(e => (e.key, e.seq,
        e.patch.get("bal").orNull, e.patch.get("seg").orNull))
        .toDF("key", "seq", "bal", "seg")
      val target = Seq.empty[(Long, String, String)]
        .toDF("key", "bal", "seg")
      val batch = graft.ops.Relational
        .patchApply(target, patches, "key", "seq", Seq("bal", "seg"))
        .as[(Long, Option[String], Option[String], String)]
        .collect().toSet
      assert(batch === got.map(r => (r.key,
        r.values.get("bal"), r.values.get("seg"), "inserted")))
    } finally q.stop()
  }

  test("patchApplyStream: duplicate seqs break to the GREATER value " +
      "in either delivery order — the LWW-register tie rule shared " +
      "with the batch fold") {
    import graft.streaming.StreamOps.{PatchEvent, PatchRow}
    implicit val sq = spark.sqlContext
    val in = MemoryStream[PatchEvent]
    val q = StreamOps.patchApplyStream(in.toDS())
      .writeStream.format("memory").queryName("patch_tie_out")
      .outputMode(OutputMode.Update).start()
    try {
      // key 1 sees the smaller value first, key 2 the greater first;
      // a bare seq-strictly-greater merge would keep arrival order
      in.addData(PatchEvent(1L, 5L, Map("bal" -> "111")),
        PatchEvent(2L, 5L, Map("bal" -> "222")))
      q.processAllAvailable()
      in.addData(PatchEvent(1L, 5L, Map("bal" -> "222")),
        PatchEvent(2L, 5L, Map("bal" -> "111")))
      q.processAllAvailable()
      val got = spark.table("patch_tie_out").as[PatchRow].collect()
        .groupBy(_.key).map { case (k, rows) =>
          k -> rows.maxBy(r => (r.max_seq, r.values("bal"))) }
      assert(got(1L).values("bal") === "222")
      assert(got(2L).values("bal") === "222")
      // the batch fold lands on the same winner (shared tie rule,
      // not a coincidence of delivery)
      val patches = Seq((1L, 5L, "111"), (1L, 5L, "222"),
        (2L, 5L, "222"), (2L, 5L, "111")).toDF("key", "seq", "bal")
      val target = Seq.empty[(Long, String)].toDF("key", "bal")
      val batch = graft.ops.Relational
        .patchApply(target, patches, "key", "seq", Seq("bal"))
        .select("key", "bal").as[(Long, String)].collect().toSet
      assert(batch === Set((1L, "222"), (2L, "222")))
    } finally q.stop()
  }

  test("patchApplyStream: tied-seq value ties compare UTF-8 BYTES " +
      "like the batch max_by and DuckDB, not UTF-16 code units") {
    import graft.streaming.StreamOps.{PatchEvent, PatchRow}
    implicit val sq = spark.sqlContext
    // U+10000 sorts BELOW U+E000 in UTF-16 (its surrogate lead is
    // 0xD800 < 0xE000) but ABOVE it in UTF-8 (F0 90 80 80 > EE 80 80)
    // — the one regime where the two orders disagree
    val lo = ""
    val hi = "𐀀"
    val in = MemoryStream[PatchEvent]
    val q = StreamOps.patchApplyStream(in.toDS())
      .writeStream.format("memory").queryName("patch_utf8_out")
      .outputMode(OutputMode.Update).start()
    try {
      // each key sees the pair in the opposite order
      in.addData(PatchEvent(1L, 5L, Map("bal" -> lo)),
        PatchEvent(2L, 5L, Map("bal" -> hi)))
      q.processAllAvailable()
      in.addData(PatchEvent(1L, 5L, Map("bal" -> hi)),
        PatchEvent(2L, 5L, Map("bal" -> lo)))
      q.processAllAvailable()
      // a touch-nothing seq-6 event marks each key's FINAL state row
      in.addData(PatchEvent(1L, 6L, Map.empty),
        PatchEvent(2L, 6L, Map.empty))
      q.processAllAvailable()
      val got = spark.table("patch_utf8_out").as[PatchRow].collect()
        .groupBy(_.key).map { case (k, rows) =>
          k -> rows.maxBy(_.max_seq) }
      assert(got(1L).values("bal") === hi)
      assert(got(2L).values("bal") === hi)
      // the batch fold picks the same winner
      val patches = Seq((1L, 5L, lo), (1L, 5L, hi),
        (2L, 5L, hi), (2L, 5L, lo)).toDF("key", "seq", "bal")
      val target = Seq.empty[(Long, String)].toDF("key", "bal")
      val batch = graft.ops.Relational
        .patchApply(target, patches, "key", "seq", Seq("bal"))
        .select("key", "bal").as[(Long, String)].collect().toSet
      assert(batch === Set((1L, hi), (2L, hi)))
    } finally q.stop()
  }

  test("runningUserCounts: same-millisecond events order by micros, " +
      "a lower straggler never regresses last_ts, and all-pre-1970 " +
      "keys report their true max (no epoch-0 sentinel)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[UserEvent]
    val q = StreamOps.runningUserCounts(in.toDS())
      .writeStream.format("memory").queryName("state_ts_out")
      .outputMode(OutputMode.Update).start()
    try {
      // same millisecond, higher micros delivered FIRST: the max is
      // the .000002 event, not whichever the iterator yields last
      in.addData(
        UserEvent(1L, ts("2024-01-01 10:00:00.000002"), "click"),
        UserEvent(1L, ts("2024-01-01 10:00:00.000001"), "view"))
      q.processAllAvailable()
      in.addData(UserEvent(1L, ts("2024-01-01 10:00:00.000001"), "view"))
      q.processAllAvailable()
      in.addData(UserEvent(2L, ts("1969-06-01 00:00:00"), "click"))
      q.processAllAvailable()
      val last = spark.table("state_ts_out").as[UserAgg].collect()
        .groupBy(_.user_id).map { case (u, rows) =>
          u -> rows.maxBy(_.n_events) }
      assert(last(1L).n_events === 3L)
      assert(last(1L).last_ts === ts("2024-01-01 10:00:00.000002"))
      assert(last(2L).last_ts === ts("1969-06-01 00:00:00"))
    } finally q.stop()
  }

  test("trendStream fails LOUD when the moment sums exceed the long " +
      "range instead of silently wrapping to a wrong slope") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    val q = StreamOps.trendStream(
        in.toDF().toDF("key", "ts", "tie", "value"))
      .writeStream.format("memory").queryName("trend_ovf_out")
      .outputMode(OutputMode.Append).start()
    try {
      // 250 years between events: x ≈ 7.9e9 s, x² ≈ 6e19 > 2^63
      in.addData((1L, ts("1970-01-01 00:00:00"), 0L, 1.0),
        (1L, ts("2220-01-01 00:00:00"), 1L, 2.0))
      val ex = intercept[Exception](q.processAllAvailable())
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(ex).exists(t => t.getMessage != null &&
        t.getMessage.contains("trendStream") &&
        t.getMessage.contains("long range")), s"got: $ex")
    } finally q.stop()
  }

  test("bitmapDistinctStream rejects out-of-range values loudly, " +
      "naming the key and value of the poison pill") {
    import graft.streaming.StreamOps.DistinctEvent
    implicit val sq = spark.sqlContext
    val in = MemoryStream[DistinctEvent]
    val q = StreamOps.bitmapDistinctStream(in.toDS())
      .writeStream.format("memory").queryName("bdist_range_out")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(DistinctEvent(7L, -1L))
      val ex = intercept[Exception](q.processAllAvailable())
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(ex).exists(t => t.getMessage != null &&
        t.getMessage.contains("outside [0, 2^32)") &&
        t.getMessage.contains("key 7") &&
        t.getMessage.contains("-1")), s"got: $ex")
    } finally q.stop()
  }

  // ----- exactly-once chaos campaign (round 18, verdict item 3) -----
  // StreamSpec's existing sink test pins clean-delivery semantics;
  // these three inject the failures the scaladoc CLAIMS to survive:
  // a crash in the write->commit window followed by a checkpoint
  // restart, a torn committer attempt's debris, and concurrent
  // duplicate delivery of one batch id.

  test("chaos: crash AFTER batch data lands but BEFORE the _SUCCESS " +
    "commit, then checkpoint restart — the replayed batch repairs the " +
    "torn dir and the table is exactly-once; the Staging dead-tmp " +
    "sweep sharing the root never touches sink dirs") {
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft-eos-chaos").toString
    val out = s"$root/table"
    val ckpt = s"$root/ckpt"
    val in = MemoryStream[(Long, String)]
    // kill-at-k-th-batch: batch 0 commits clean; batch 1's first
    // attempt dies after its files land but before the marker is
    // durable (the commit window). Simulated by completing the write,
    // tearing the marker off, and throwing — exactly the on-disk
    // state a kill -9 between the two leaves behind.
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val q1 = in.toDF().toDF("k", "v").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamOps.writeBatchIdempotent(b, out, id): Unit
        if (id == 1L && !crashed.getAndSet(true)) {
          val marker = new java.io.File(s"$out/batch_id=1/_SUCCESS")
          assert(marker.delete(), "chaos setup: marker must exist")
          sys.error("chaos: killed between write and commit")
        }
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    in.addData((1L, "a"))
    q1.processAllAvailable()
    in.addData((2L, "b"), (3L, "c"))
    scala.util.Try(q1.processAllAvailable())
    assert(q1.exception.isDefined, "the injected crash must kill q1")
    scala.util.Try(q1.stop())
    // on-disk now: batch 1 torn (files, no marker). A staged-fixture
    // publisher crash remnant lands in the SAME root (dead pid) —
    // the shared liveness sweep must reclaim it without touching the
    // sink's torn dir (sink dirs never match the tmp name shape).
    val deadPid = Iterator.iterate(999999L)(_ + 7)
      .find(p => ProcessHandle.of(p).isEmpty).get
    val remnant = new java.io.File(out, s".junk__fpab.tmp-$deadPid-42")
    remnant.mkdirs()
    new java.io.File(remnant, "part-00000.jsonl").createNewFile()
    graft.sources.Staging.sweepDeadTmpMatching(new java.io.File(out),
      """^\.junk__fp[0-9a-f]+\.tmp-(\d+)--?\d+$""".r)
    assert(!remnant.exists(), "dead-pid remnant must be reclaimed")
    assert(new java.io.File(out, "batch_id=1").isDirectory &&
      !new java.io.File(s"$out/batch_id=1/_SUCCESS").isFile,
      "the sweep must not repair or delete the sink's torn batch dir")
    // restart from the same checkpoint: Structured Streaming re-runs
    // batch 1 from the offset WAL (written before execution), the
    // idempotent sink sees no marker and REWRITES the torn dir whole
    val q2 = StreamOps.exactlyOnceParquetSink(
      in.toDF().toDF("k", "v"), out, ckpt)
    try {
      q2.processAllAvailable()
      in.addData((4L, "d"))
      q2.processAllAvailable()
      val got = spark.read.parquet(out)
        .select($"k", $"v").as[(Long, String)].collect().toList
      assert(got.sorted ===
        List((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")),
        "exactly once: no loss from the crash, no dup from the replay")
      assert(new java.io.File(s"$out/batch_id=1/_SUCCESS").isFile,
        "the replayed batch must commit")
      assert(spark.read.parquet(out).select($"batch_id")
        .distinct().count() === 3)
    } finally q2.stop()
  }

  test("chaos: keyed STATE survives a crash + checkpoint restart — " +
    "ewmaStream killed in batch 1's commit window resumes from the " +
    "state store (accumulator, count, high-water mark) and the " +
    "exactly-once table equals an uninterrupted run point for point") {
    implicit val sq = spark.sqlContext
    def evBatch(ks: Seq[Long], t0: Int): Seq[(Long, Timestamp, Long, Double)] =
      for { k <- ks; i <- 0 until 3 } yield
        (k, ts(f"2024-01-01 00:${t0 + i}%02d:00"), 0L, (t0 + i) * 1.25 + k)
    val b1 = evBatch(Seq(1L, 2L), 0)
    val b2 = evBatch(Seq(1L, 2L), 10)
    val b3 = evBatch(Seq(1L, 2L), 20)
    def run(root: String, crash: Boolean): Set[(Long, Timestamp, Long,
        Long, Long)] = {
      val out = s"$root/table"; val ckpt = s"$root/ckpt"
      val in = MemoryStream[(Long, Timestamp, Long, Double)]
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def start() = StreamOps.ewmaStream(
          in.toDF().toDF("key", "ts", "tie", "value")).toDF()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          StreamOps.writeBatchIdempotent(b, out, id): Unit
          if (crash && id == 1L && !crashed.getAndSet(true)) {
            assert(new java.io.File(s"$out/batch_id=1/_SUCCESS").delete())
            sys.error("chaos: killed between state write and commit")
          }
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
      val q1 = start()
      in.addData(b1); q1.processAllAvailable()
      in.addData(b2)
      if (crash) {
        scala.util.Try(q1.processAllAvailable())
        assert(q1.exception.isDefined, "injected crash must kill q1")
        scala.util.Try(q1.stop())
        // restart from the checkpoint: batch 1 replays against the
        // RESTORED per-key state (acc/n/high-water from batch 0) —
        // a state-encoder or recovery defect shows as n restarting
        // at 1 or a wrong accumulator, which the point-for-point
        // compare below catches
        val q2 = start()
        try {
          q2.processAllAvailable()
          in.addData(b3); q2.processAllAvailable()
        } finally q2.stop()
      } else {
        q1.processAllAvailable()
        in.addData(b3); q1.processAllAvailable()
        q1.stop()
      }
      spark.read.parquet(out)
        .select($"key", $"ts", $"tie", $"n_events", $"ewma_micros")
        .as[(Long, Timestamp, Long, Long, Long)].collect().toSet
    }
    val clean = run(java.nio.file.Files
      .createTempDirectory("graft-state-clean").toString, crash = false)
    val crashed = run(java.nio.file.Files
      .createTempDirectory("graft-state-chaos").toString, crash = true)
    assert(clean.size === 18, "3 batches x 2 keys x 3 events")
    assert(crashed === clean,
      "state recovery must make the crashed run's table identical " +
        "to the uninterrupted run's — no restarted counts, no " +
        "re-folded accumulators, no lost or duplicated points")
    // the last point per key proves the fold ran over ALL 9 events
    // in order (n = 9), not a per-restart restart
    for (k <- Seq(1L, 2L))
      assert(crashed.filter(_._1 == k).maxBy(_._2.getTime)._4 === 9L)
  }

  test("chaos: a torn committer attempt's debris (_temporary tree + " +
    "orphan part files) is replaced WHOLE on redelivery — nothing " +
    "from the dead attempt survives into the committed batch") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-eos-torn").toString
    val out = s"$root/table"
    val dir = new java.io.File(out, "batch_id=7")
    // debris a task-kill mid-commit leaves: the committer's staging
    // tree, a half-moved part file, and a zero-byte marker-less mess
    val tmp = new java.io.File(dir, "_temporary/0/task_000/")
    tmp.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(tmp, "part-00000-dead.snappy.parquet").toPath,
      Array[Byte](1, 2, 3))
    java.nio.file.Files.write(
      new java.io.File(dir, "part-00000-orphan.snappy.parquet").toPath,
      "not parquet".getBytes)
    assert(!new java.io.File(dir, "_SUCCESS").isFile)
    val payload = Seq((7L, "x"), (8L, "y")).toDF("k", "v")
    assert(StreamOps.writeBatchIdempotent(payload, out, 7L),
      "an uncommitted dir must be rewritten, debris or not")
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .map(_.getName).toSet
    assert(!files.contains("_temporary"),
      s"dead staging tree must not survive, got: $files")
    assert(!files.contains("part-00000-orphan.snappy.parquet"),
      "orphan part file from the dead attempt must not survive")
    assert(spark.read.parquet(dir.toString)
      .as[(Long, String)].collect().toSet === Set((7L, "x"), (8L, "y")))
  }

  test("chaos: concurrent duplicate delivery of one batch id — " +
    "exactly one writer wins, the committed content is one payload " +
    "whole, never an interleaved mix") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-eos-dup").toString
    val out = s"$root/table"
    val payloadA = Seq((1L, "A1"), (2L, "A2")).toDF("k", "v")
    val payloadB = Seq((1L, "B1"), (2L, "B2")).toDF("k", "v")
    // two redeliveries of batch 5 race from a barrier; without the
    // in-JVM serialization both would pass the no-marker probe and
    // interleave their overwrite passes (distinct task UUIDs — both
    // payloads' files would coexist)
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
    val threads = Seq("A" -> payloadA, "B" -> payloadB).map {
      case (tag, p) =>
        new Thread(() => {
          gate.await()
          results.put(tag, StreamOps.writeBatchIdempotent(p, out, 5L))
        })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(results.size === 2)
    import scala.jdk.CollectionConverters._
    val winners = results.asScala.filter(_._2).keys.toList
    assert(winners.size === 1,
      s"exactly one duplicate may perform the write, got: $results")
    val got = spark.read.parquet(s"$out/batch_id=5")
      .as[(Long, String)].collect().toSet
    val expected = if (winners.head == "A")
      Set((1L, "A1"), (2L, "A2")) else Set((1L, "B1"), (2L, "B2"))
    assert(got === expected,
      "committed content must be the winner's payload whole")
  }
}
