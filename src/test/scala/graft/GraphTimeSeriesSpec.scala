package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ext._

/** Hand-computed expectations for the graph, time-series, profiling,
  * and compaction-planning operators on tiny literal frames.
  */
class GraphTimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // -- Graph -----------------------------------------------------------

  test("pageRank on a 3-path matches the hand-rolled integer schedule") {
    // graph 1–2–3 (symmetric); deg(1)=deg(3)=1, deg(2)=2
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("node_id")
    // round 1: r(1)=r(3)=150000+17*(1000000/2)/20=575000
    //          r(2)=150000+17*(1000000+1000000)/20=1850000
    // round 2: r(1)=r(3)=150000+17*(1850000/2)/20=936250
    //          r(2)=150000+17*(575000+575000)/20=1127500
    val got = Graph.pageRank(edges, nodes, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L))
  }

  test("pageRank: a node with no in-edges keeps exactly the teleport " +
      "mass; an absent contribution is 0, not null") {
    // 1 → 2 only; node 3 isolated
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("node_id")
    val got = Graph.pageRank(edges, nodes, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === 150000L && got(3L) === 150000L)
    assert(got(2L) === 150000L + 17L * 1000000L / 20L)
  }

  test("pageRank early-exits on the exact integer fixpoint: a " +
      "1-regular graph is at its fixpoint from the seed, so a " +
      "20-iteration budget runs ONE confirming round") {
    // symmetric pair: every node deg 1, rank stays exactly 1_000_000
    // (150000 + 17·1000000 div 20 = 1000000) — fixpoint from round 1
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L).toDF("node_id")
    val (ranks, rounds) = Graph.pageRankRounds(
      Graph.prepareEdges(edges).localCheckpoint(true), nodes, iters = 20)
    assert(ranks.as[(Long, Long)].collect().toMap ===
      Map(1L -> 1000000L, 2L -> 1000000L))
    assert(rounds === 1, s"fixpoint not detected, ran $rounds rounds")
    // and a non-trivial graph still uses its full small budget
    val path = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val (_, r2) = Graph.pageRankRounds(
      Graph.prepareEdges(path).localCheckpoint(true),
      Seq(1L, 2L, 3L).toDF("node_id"), iters = 2)
    assert(r2 === 2)
  }

  test("triangleStats counts the one triangle of a paw graph, with " +
      "degree-ordered wedges") {
    // triangle {1,2,3} plus pendant edge 3–4
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val got = Graph.triangleStats(edges)
      .as[(Long, Long, Long, Long)].collect().head
    // orientation: deg 1=2, 2=2, 3=3, 4=1 → 1→2, 1→3, 2→3, 4→3;
    // only apex 1 has two out-neighbors → exactly one wedge, closed
    assert(got === ((4L, 4L, 1L, 1L)))
  }

  test("kHopDistances: frontier expansion relaxes to min hops, " +
      "unreached nodes absent, cycles don't inflate distances") {
    // path 1-2-3-4-5 plus a 1-3 chord: dist(3) must relax to 1
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = Graph.kHopDistances(und, Seq(1L).toDF("id"), hops = 2)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("coOccurrenceEdges applies the support floor and drops " +
      "over-sized hot groups before the pair join") {
    val inc = (Seq(("g1", "a"), ("g1", "b"), ("g1", "c"),
      ("g2", "a"), ("g2", "b"), ("g3", "a"), ("g3", "b"),
      // duplicate incidence row: must not inflate support
      ("g3", "a")) ++
      // hot group of 5 items: dropped whole at maxGroupSize = 4
      (1 to 5).map(i => ("hot", s"x$i"))).toDF("group", "item")
    val got = Graph.coOccurrenceEdges(inc, minSupport = 2,
      maxGroupSize = 4)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("a", "b", 3L)))
  }

  test("commonNeighborScores: wedge-generated candidates with exact " +
      "micro jaccard; a hub center over maxDeg generates no pairs") {
    // square a,b × c,d plus chord a–b, and a disjoint 5-spoke hub
    val edges = (Seq(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d")) ++
      (1 to 5).map(i => ("h", s"x$i"))).toDF("u", "v")
    // common(a,b) = {c,d} = 2, deg 3+3 → 2e6 div 4 = 500000
    // common(c,d) = {a,b} = 2, deg 2+2 → 2e6 div 2 = 1000000
    val got = Graph.commonNeighborScores(edges, minCommon = 2,
        maxDeg = 4)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got === Map(("a", "b") -> ((2L, 500000L)),
      ("c", "d") -> ((2L, 1000000L))))
    // at minCommon = 1 the hub component still contributes nothing:
    // h (deg 5 > maxDeg 4) is dropped as a CENTER, the x_i (deg 1)
    // are never centers — so no x-pair is ever materialized
    val all = Graph.commonNeighborScores(edges, minCommon = 1,
        maxDeg = 4)
      .as[(String, String, Long, Long)].collect()
    assert(all.nonEmpty && all.forall { case (u, v, _, _) =>
      !u.startsWith("x") && !v.startsWith("x") })
  }

  test("commonNeighborScores matches a brute-force neighborhood " +
      "jaccard on a random graph when no center is capped, and is " +
      "partitioning-invariant") {
    val rnd = new scala.util.Random(29)
    val edgeSet = (for (_ <- 1 to 60) yield {
      val u = rnd.nextInt(12); val v = rnd.nextInt(12)
      if (u < v) Some((u.toLong, v.toLong))
      else if (v < u) Some((v.toLong, u.toLong)) else None
    }).flatten.distinct
    val edges = edgeSet.toDF("u", "v")
    val adj = edgeSet.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val want = (for {
      u <- adj.keys; v <- adj.keys if u < v
      common = (adj(u) & adj(v)).size if common >= 2
    } yield (u, v) -> ((common.toLong,
      common.toLong * 1000000L / (adj(u).size + adj(v).size - common))))
      .toMap
    val got = Graph.commonNeighborScores(edges, minCommon = 2,
        maxDeg = 100)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got === want)
    val got2 = Graph.commonNeighborScores(edges.repartition(7),
        minCommon = 2, maxDeg = 100)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got2 === want)
  }

  // -- Similarity (MIPS) ----------------------------------------------

  test("mipsTopK matches a plain-Scala mirror of the augmented-space " +
      "reduction: same buckets, exact inner-product ranks") {
    val dims = 4
    val rnd = new scala.util.Random(99)
    val vecs: Seq[(Long, Array[Float])] = (0L until 12L).map { i =>
      i -> Array.fill(dims)((rnd.nextDouble() * 4 - 2).toFloat)
    }
    val df = vecs.toDF("id", "vec")
    val got = Similarity.mipsTopK(df.filter($"id" < 3), df, k = 3,
        planes = 2, dims = dims)
      .as[(Long, Long, Double)].collect().toSet
    // mirror: identical double folds, max norm, augmented buckets
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val m = vecs.map(v => nrm(v._2)).max
    val pl = Similarity.hyperplanes(2, dims + 1)
    def bucket(v: Array[Float], extra: Double): Long =
      pl.zipWithIndex.map { case (w, p) =>
        val proj = v.indices.foldLeft(0.0)((s, i) =>
          s + v(i).toDouble * w(i).toFloat.toDouble) +
          w(dims).toDouble * extra
        if (proj > 0) 1L << p else 0L
      }.sum
    def cExtra(v: Array[Float]): Double =
      math.sqrt(math.max(m * m - nrm(v) * nrm(v), 0.0))
    val expect = vecs.filter(_._1 < 3).flatMap { case (qid, qv) =>
      val qb = bucket(qv, 0.0)
      vecs.filter { case (cid, cv) =>
        cid != qid && bucket(cv, cExtra(cv)) == qb }
        .map { case (cid, cv) => (cid, dot(qv, cv)) }
        .sortBy { case (cid, ip) => (-ip, cid) }
        .take(3)
        .map { case (cid, ip) => (qid, cid, ip) }
    }.toSet
    assert(got === expect)
    assert(expect.nonEmpty) // the fixture must actually exercise it
  }

  // -- Profiling -------------------------------------------------------

  test("equidepthBins: NULL-key rows form a first-class group and " +
      "match their own thresholds back (null-safe join) — the same " +
      "contract keySkewProfile keeps in this module") {
    val rows: Seq[(Option[String], Long, Long)] =
      Seq((Some("a"), 1L, 1L), (Some("a"), 2L, 2L),
        (None, 3L, 5L), (None, 4L, 6L), (None, 5L, 7L), (None, 6L, 8L))
    val got = Profiling.equidepthBins(
        rows.toDF("lang", "doc_id", "n_chars"),
        key = "lang", score = "n_chars", q = 2)
      .select($"doc_id", $"bin").as[(Long, Int)].collect().toMap
    // null group thresholds from its own histogram (t1 = 6):
    // 5,6 → bin 0; 7,8 → bin 1. An equi-join would drop docs 3-6.
    assert(got === Map(1L -> 0, 2L -> 1,
      3L -> 0, 4L -> 0, 5L -> 1, 6L -> 1))
  }

  test("equidepthBins: NULL scores stay out of the histogram (the " +
      "PERCENTILE_DISC-ignores-NULLs contract) — they neither shift " +
      "thresholds nor count toward the depth") {
    // 100 real scores 1..100 at q=2 must split 50/50 at t=50 even
    // with 100 NULL-score rows alongside; unfiltered, the NULL
    // struct sorts first and nulls the threshold, pushing every real
    // row into bin 0
    val rows = (1 to 100).map(i => ("k", i.toLong, Some(i.toLong))) ++
      (1 to 100).map(i => ("k", 1000L + i, Option.empty[Long]))
    val got = Profiling.equidepthBins(
        rows.toDF("lang", "doc_id", "n_chars"),
        key = "lang", score = "n_chars", q = 2)
      .filter($"n_chars".isNotNull)
      .select($"doc_id", $"bin").as[(Long, Int)].collect()
    assert(got.count(_._2 == 0) === 50, s"bin0=${got.count(_._2 == 0)}")
    assert(got.count(_._2 == 1) === 50)
  }

  test("equidepthBins: exact PERCENTILE_DISC cuts, ties land whole " +
      "in the lower bin, per-key boundaries independent") {
    // key a: 1..10 once each at q=5 → bins 0,0,1,1,2,2,3,3,4,4
    // key b: [5,5,5,6] at q=5 → the 5-tie group stays whole in bin 0;
    // 6 exceeds thresholds (5,5,5) but not t4=6 → bin 3
    val rows = (1 to 10).map(i => ("a", i.toLong, i.toLong)) ++
      Seq(("b", 100L, 5L), ("b", 101L, 5L), ("b", 102L, 5L),
        ("b", 103L, 6L))
    val got = Profiling.equidepthBins(
        rows.toDF("lang", "doc_id", "n_chars"),
        key = "lang", score = "n_chars", q = 5)
      .select($"lang", $"doc_id", $"bin")
      .as[(String, Long, Int)].collect().toSet
    val expectA = (1 to 10).map(i => ("a", i.toLong, (i - 1) / 2)).toSet
    val expectB = Set(("b", 100L, 0), ("b", 101L, 0), ("b", 102L, 0),
      ("b", 103L, 3))
    assert(got === expectA ++ expectB)
  }

  test("equidepthBins / winsorize match a brute-force PERCENTILE_DISC " +
      "oracle on random tie-heavy data under partitionings") {
    // the histogram folds CLAIM exact PERCENTILE_DISC semantics
    // (threshold_i = largest value whose strictly-below count is
    // < n*i/q) — this replays that definition literally over random
    // data with heavy ties, NULL scores, and a NULL key, at several
    // partitionings (the fold runs inside collect_list over a sorted
    // histogram; partition count must be invisible)
    val rnd = new scala.util.Random(42)
    val rows: Seq[(Option[String], Long, Option[Long])] =
      Seq.tabulate(300) { i =>
        val k = rnd.nextInt(5) match {
          case 0 => None // NULL key: first-class group
          case n => Some(s"k$n")
        }
        val s = if (rnd.nextInt(10) == 0) None
          else Some(rnd.nextInt(8).toLong) // 8 distinct values: ties
        (k, i.toLong, s)
      }
    def thresholds(vs: Seq[Long], cuts: Seq[(Long, Long)]): Seq[Long] = {
      // cut = (num, den): threshold = largest v with below*den < n*num
      val sorted = vs.sorted
      val n = vs.size.toLong
      cuts.map { case (num, den) =>
        sorted.zipWithIndex
          .filter { case (v, _) => sorted.count(_ < v) * den < n * num }
          .map(_._1).max
      }
    }
    for (parts <- Seq(1, 5); q <- Seq(2, 3, 5)) {
      val df = rows.toDF("k", "id", "s").repartition(parts)
      val got = Profiling.equidepthBins(df, key = "k", score = "s", q = q)
        .select($"id", $"bin").as[(Long, Int)].collect().toMap
      val byKey = rows.groupBy(_._1)
      byKey.foreach { case (_, krows) =>
        val scored = krows.flatMap(r => r._3.map(s => (r._2, s)))
        if (scored.nonEmpty) {
          val th = thresholds(scored.map(_._2),
            (1 until q).map(i => (i.toLong, q.toLong)))
          scored.foreach { case (id, s) =>
            assert(got(id) === th.count(s > _),
              s"parts=$parts q=$q id=$id score=$s th=$th")
          }
          // NULL-score rows of a scored key bin as 0 (doc contract)
          krows.filter(_._3.isEmpty)
            .foreach(r => assert(got(r._2) === 0))
        } else
          // all-NULL-score keys drop with their threshold row
          krows.foreach(r => assert(!got.contains(r._2)))
      }
      // winsorize at [10, 90] percent: same brute-force rule
      val w = Profiling.winsorize(df, $"k", $"id", $"s",
          loBp = 1000, hiBp = 9000)
        .select($"id", $"v_wins").as[(Long, Option[Long])]
        .collect().toMap
      byKey.foreach { case (_, krows) =>
        val scored = krows.flatMap(r => r._3.map(s => (r._2, s)))
        if (scored.nonEmpty) {
          val Seq(lo, hi) = thresholds(scored.map(_._2),
            Seq((1000L, 10000L), (9000L, 10000L)))
          scored.foreach { case (id, s) =>
            assert(w(id) === Some(math.min(math.max(s, lo), hi)),
              s"parts=$parts id=$id s=$s lo=$lo hi=$hi")
          }
        }
        // NULL values pass through unclamped as NULL
        krows.filter(_._3.isEmpty).foreach(r => assert(w(r._2).isEmpty))
      }
    }
  }

  test("keySkewProfile: exact ranks, ppm shares, cumulative shares") {
    val df = (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("c"))
      .toDF("k")
    val got = Profiling.keySkewProfile(df, col("k"), k = 2)
      .as[(String, Long, Int, Long, Long)].collect().toSet
    // total 6: a 3/6 = 500000 ppm, cum 500000; b 2/6 = 333333, cum 833333
    assert(got === Set(("a", 3L, 1, 500000L, 500000L),
      ("b", 2L, 2, 333333L, 833333L)))
  }

  test("keySkewProfile: a NULL key — the classic real-world skew " +
      "cause — ranks as a first-class (smallest) key, never dropped") {
    // null is the HEAVIEST key and ties with "a" are broken
    // nulls-first
    val df = (Seq.fill(3)(None) ++ Seq.fill(3)(Some("a")) ++
      Seq(Some("b"))).toDF("k")
    val got = Profiling.keySkewProfile(df, col("k"), k = 3)
      .as[(Option[String], Long, Int, Long, Long)].collect().toSet
    // total 7: null 3/7=428571 cum 428571; a 3/7 cum 857142; b 1/7
    assert(got === Set(
      (None, 3L, 1, 428571L, 428571L),
      (Some("a"), 3L, 2, 428571L, 857142L),
      (Some("b"), 1L, 3, 142857L, 1000000L)))
  }

  // -- Layout ----------------------------------------------------------

  test("compactionPlan: prefix-sum binning closes buckets at the " +
      "target and keeps file order") {
    val files = Seq(("p", 1L, 10L), ("p", 2L, 20L), ("p", 3L, 5L),
      ("p", 4L, 40L), ("p", 5L, 100L), ("q", 1L, 99L))
      .toDF("part", "file_id", "bytes")
    val got = Layout.compactionPlan(files, targetBytes = 30L)
      .select("part", "file_id", "out_bucket")
      .as[(String, Long, Long)].collect().toSet
    // p cum-exclusive: 0,10,30,35,75 → buckets 0,0,1,1,2; q restarts
    assert(got === Set(("p", 1L, 0L), ("p", 2L, 0L), ("p", 3L, 1L),
      ("p", 4L, 1L), ("p", 5L, 2L), ("q", 1L, 0L)))
  }

  // -- TimeSeries ------------------------------------------------------

  test("resampleLocf: dense per-key grid, max within slot, LOCF " +
      "across gaps, observed flags") {
    val events = Seq(
      (7L, ts("2024-01-01 00:10:00"), 1.0),
      (7L, ts("2024-01-01 00:50:00"), 4.0), // same slot → max 4.0
      (7L, ts("2024-01-01 03:20:00"), 2.0),
      (8L, ts("2024-01-01 05:00:00"), 9.0))
      .toDF("key", "ts", "value")
    val got = TimeSeries.resampleLocf(events, slotSeconds = 3600)
      .select(col("key"), col("slot"), col("v_locf"), col("observed"))
      .as[(Long, Timestamp, Double, Boolean)].collect().toSet
    assert(got === Set(
      (7L, ts("2024-01-01 00:00:00"), 4.0, true),
      (7L, ts("2024-01-01 01:00:00"), 4.0, false),
      (7L, ts("2024-01-01 02:00:00"), 4.0, false),
      (7L, ts("2024-01-01 03:00:00"), 2.0, true),
      (8L, ts("2024-01-01 05:00:00"), 9.0, true)))
  }

  test("resampleLocf chunked grid: spans crossing 4096-slot chunk " +
      "boundaries produce exactly the dense slot set, no dupes, no " +
      "gaps") {
    // slot = 60 s; span of 10_000 minutes crosses two chunk
    // boundaries (4096, 8192) with non-aligned endpoints
    val t0 = ts("2024-01-01 00:07:00")
    val tN = new Timestamp(t0.getTime + 9999L * 60000L)
    val events = Seq((1L, t0, 1.0), (1L, tN, 2.0)).toDF("key", "ts", "value")
    val got = TimeSeries.resampleLocf(events, slotSeconds = 60)
      .select(col("slot")).as[Timestamp].collect()
    assert(got.length === 10000)
    assert(got.distinct.length === 10000)
    assert(got.min === t0 && got.max === tN)
  }

  test("resampleLocf pre-1970: floor slotting buckets negative epochs " +
      "to the slot AT-OR-BEFORE, and floor chunk indices keep the " +
      "grid dense across negative chunk boundaries and zero") {
    // slot = 60 s. Key 1 spans slot indices [-5000, -100] (crosses
    // the -4096 chunk boundary); key 2 spans [-5000, 1] (straddles
    // zero — with truncating division, chunk 0 would plan the
    // DESCENDING sequence(0, -100) and chunks -1/0 would overlap).
    // Event timestamps sit MID-slot so truncation would bucket them
    // one slot too high.
    val e1a = new Timestamp(-300000L * 1000 + 10000) // slot -5000
    val e1b = new Timestamp(-6000L * 1000 + 5000)    // slot -100
    val e2c = new Timestamp(70L * 1000)              // slot 1
    val events = Seq((1L, e1a, 1.0), (1L, e1b, 2.0),
      (2L, e1a, 1.0), (2L, e2c, 3.0)).toDF("key", "ts", "value")
    val got = TimeSeries.resampleLocf(events, slotSeconds = 60)
      .select(col("key"), col("slot"))
      .as[(Long, Timestamp)].collect()
    val k1 = got.filter(_._1 == 1L).map(_._2.getTime)
    val k2 = got.filter(_._1 == 2L).map(_._2.getTime)
    assert(k1.length === 4901 && k1.distinct.length === 4901)
    assert(k1.min === -300000L * 1000 && k1.max === -6000L * 1000)
    assert(k2.length === 5002 && k2.distinct.length === 5002)
    assert(k2.min === -300000L * 1000 && k2.max === 60L * 1000)
  }

  test("resampleLocf NULL-key series is first-class: its slots read " +
      "observed=true and carry LOCF like any other key (a plain " +
      "equi-join shape would read every slot as unobserved)") {
    val events = Seq(
      (Some(1L), ts("2024-01-01 00:00:00"), 1.0),
      (None, ts("2024-01-01 00:00:00"), 7.0),
      (None, ts("2024-01-01 02:00:00"), 9.0))
      .toDF("key", "ts", "value")
    val got = TimeSeries.resampleLocf(events, slotSeconds = 3600)
      .select(col("key"), col("slot"), col("v_locf"), col("observed"))
      .as[(Option[Long], Timestamp, Double, Boolean)].collect().toSet
    assert(got === Set(
      (Some(1L), ts("2024-01-01 00:00:00"), 1.0, true),
      (None, ts("2024-01-01 00:00:00"), 7.0, true),
      (None, ts("2024-01-01 01:00:00"), 7.0, false),
      (None, ts("2024-01-01 02:00:00"), 9.0, true)))
  }

  test("resampleLocf NULL-ts events are ignored: no slot, no carry " +
      "leak into the next observation's segment (an unfiltered NULL " +
      "index would sort first and poison the keyed window's LOCF)") {
    val events = Seq(
      (1L, Option.empty[Timestamp], Some(99.0)), // no slot — ignored
      (1L, Some(ts("2024-01-01 01:00:00")), None), // NULL-v observation
      (1L, Some(ts("2024-01-01 02:00:00")), Some(3.0)))
      .toDF("key", "ts", "value")
    val got = TimeSeries.resampleLocf(events, slotSeconds = 3600)
      .select(col("slot"), col("v_locf"), col("observed"))
      .as[(Timestamp, Option[Double], Boolean)].collect().toSet
    // the NULL-ts 99.0 must NOT become the first slot's carry
    assert(got === Set(
      (ts("2024-01-01 01:00:00"), None, false),
      (ts("2024-01-01 02:00:00"), Some(3.0), true)))
  }

  test("resampleLocf all-NULL-value slot: observed=false at its own " +
      "slot and the segment carries the PREVIOUS non-null value " +
      "(carrying the NULL itself would blank the whole gap)") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), Some(5.0)),
      (1L, ts("2024-01-01 01:00:00"), None), // NULL observation
      (1L, ts("2024-01-01 03:00:00"), Some(2.0)))
      .toDF("key", "ts", "value")
    val got = TimeSeries.resampleLocf(events, slotSeconds = 3600)
      .select(col("slot"), col("v_locf"), col("observed"))
      .as[(Timestamp, Double, Boolean)].collect().toSet
    assert(got === Set(
      (ts("2024-01-01 00:00:00"), 5.0, true),
      (ts("2024-01-01 01:00:00"), 5.0, false), // NULL obs: not observed
      (ts("2024-01-01 02:00:00"), 5.0, false),
      (ts("2024-01-01 03:00:00"), 2.0, true)))
  }

  test("resampleLocf pre-1970 SUB-SECOND events floor to the slot " +
      "at-or-before: a seconds intermediate would truncate -0.6s to " +
      "0 and bucket the event one slot late") {
    // 1969-12-31 23:59:59.4 = epoch -600 ms → slot -60 s, not 0
    val events = Seq((1L, new Timestamp(-600L), 5.0))
      .toDF("key", "ts", "value")
    val got = TimeSeries.resampleLocf(events, slotSeconds = 60)
      .select(col("slot")).as[Timestamp].collect()
    assert(got.toSeq === Seq(new Timestamp(-60000L)))
  }

  test("cusumChangepoint fails LOUD when |S| exceeds the long range " +
      "instead of returning a silently-NULL magnitude") {
    // ±5e11 scales to ±5e17 micro-units; 20 alternating events put
    // max |S| = |prefix|·n ≈ 1e19 past 2^63 ≈ 9.2e18
    val events = (0 until 20).map(i =>
      (1L, ts(f"2024-01-01 00:$i%02d:00"),
        if (i % 2 == 0) 5e11 else -5e11, i.toLong))
      .toDF("key", "ts", "value", "event_id")
    val ex = intercept[Exception] {
      TimeSeries.cusumChangepoint(events, tie = col("event_id"))
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t => t.getMessage != null &&
      t.getMessage.contains("cusumChangepoint")), s"got: $ex")
  }

  test("ewmaFixed on NEGATIVE values truncates toward zero exactly " +
      "like the Scala fold of the streaming twin — the shared " +
      "tri-engine division semantics (DuckDB 1.0 // also truncates: " +
      "-3 // 2 = -1)") {
    // odd negative accumulator sums are where truncation and floor
    // disagree: (-1000001) / 2 = -500000 trunc vs -500001 floor
    val vals = Seq(-3.000001, 2.0, -9.999999)
    val micro = vals.map(v => math.floor(v * 1e6).toLong)
    val expect = micro.tail.foldLeft(micro.head)((a, x) => (a + x) / 2)
    val events = vals.zipWithIndex.map { case (v, i) =>
      (9L, ts(f"2024-01-01 00:0$i:00"), v, i.toLong)
    }.toDF("key", "ts", "value", "event_id")
    val got = TimeSeries.ewmaFixed(events, tie = col("event_id"))
      .as[(Long, Long, Long)].collect().head
    assert(got === ((9L, 3L, expect)))
    assert(expect === -5249999L) // trunc; floor semantics give -5250000
  }

  test("ewmaFixed: NULL-value and NULL-ts events do not participate " +
      "— no silent NULL-poisoned fold, no engine-dependent seed, " +
      "n_events counts participants only") {
    val events = Seq(
      (1L, Some(ts("2024-01-01 00:00:00")), Some(4.0), 1L),
      (1L, Some(ts("2024-01-01 00:01:00")), None, 2L), // NULL value
      (1L, Option.empty[Timestamp], Some(100.0), 3L),  // NULL ts
      (1L, Some(ts("2024-01-01 00:02:00")), Some(2.0), 4L))
      .toDF("key", "ts", "value", "event_id")
    val got = TimeSeries.ewmaFixed(events, tie = col("event_id"))
      .as[(Long, Long, Long)].collect().head
    // fold over [4e6, 2e6] only: (4e6 + 2e6) div 2 = 3e6
    assert(got === ((1L, 2L, 3000000L)))
  }

  test("ewmaFixed matches the sequential (acc + x) div 2 fold in " +
      "event order, independent of input row order") {
    val vals = Seq(3.5, 1.25, 10.0, 0.000001, 7.75)
    val micro = vals.map(v => math.floor(v * 1e6).toLong)
    val expect = micro.tail.foldLeft(micro.head)((a, x) => (a + x) / 2)
    // deliver rows shuffled; (ts, event_id) recovers the order
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (5L, ts(f"2024-01-01 00:0$i:00"), v, i.toLong)
    }
    val events = scala.util.Random.shuffle(rows)
      .toDF("key", "ts", "value", "event_id")
    val got = TimeSeries.ewmaFixed(events, tie = col("event_id"))
      .as[(Long, Long, Long)].collect().head
    assert(got === ((5L, 5L, expect)))
  }

  test("ewmaFixed enforces the per-key buffer cap loudly: a hot key " +
      "raises with its key and count before any row-list accumulates; " +
      "keys at the cap still fold exactly") {
    val base = ts("2024-01-01 00:00:00").getTime
    // key 1 is hot (8 events), key 2 is cool (3) — cap at 4
    val rows = (0 until 8).map(i =>
      (1L, new Timestamp(base + i * 1000L), i.toDouble, i.toLong)) ++
      (0 until 3).map(i =>
        (2L, new Timestamp(base + i * 1000L), i.toDouble, i.toLong))
    val events = rows.toDF("key", "ts", "value", "event_id")
    val e = intercept[Exception] {
      TimeSeries.ewmaFixed(events, tie = col("event_id"),
        maxEventsPerKey = 4).collect()
    }
    assert(e.getMessage.contains("ewmaFixed: key 1 has 8 events"))
    // at exactly the cap everything still folds, bit-identically to
    // the uncapped default
    val cool = events.filter(col("key") === 2L ||
      (col("key") === 1L && col("event_id") < 4))
    val capped = TimeSeries.ewmaFixed(cool, tie = col("event_id"),
        maxEventsPerKey = 4)
      .as[(Long, Long, Long)].collect().toSet
    val default = TimeSeries.ewmaFixed(cool, tie = col("event_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(capped === default)
    assert(capped.map(_._1) === Set(1L, 2L))
  }

  test("ohlcBars: one bar per (key, bucket); open/close follow the " +
      "(ts, tie) total order even on tied timestamps; micro sums " +
      "exact; negative values FLOOR to micros") {
    val events = Seq(
      ("m", ts("2024-01-01 10:00:05"), 2.5, 1L),
      ("m", ts("2024-01-01 10:20:00"), 9.0, 2L),
      ("m", ts("2024-01-01 10:59:59"), 1.25, 3L),
      // tied timestamps: event_id orders open=4.0, close=3.0
      ("m", ts("2024-01-01 11:30:00"), 4.0, 4L),
      ("m", ts("2024-01-01 11:30:00"), 3.0, 5L),
      ("n", ts("2024-01-01 10:10:00"), -1.0000005, 6L)
    ).toDF("key", "ts", "value", "event_id")
    val got = TimeSeries.ohlcBars(events, bucketSeconds = 3600,
        tie = col("event_id"))
      .as[(String, Timestamp, Long, Long, Long, Long, Long, Long)]
      .collect()
      .map(r => (r._1, r._2) ->
        ((r._3, r._4, r._5, r._6, r._7, r._8))).toMap
    assert(got(("m", ts("2024-01-01 10:00:00"))) ===
      ((2500000L, 9000000L, 1250000L, 1250000L, 12750000L, 3L)))
    assert(got(("m", ts("2024-01-01 11:00:00"))) ===
      ((4000000L, 4000000L, 3000000L, 3000000L, 7000000L, 2L)))
    // floor(-1.0000005e6) = -1000001: floor, never truncation
    assert(got(("n", ts("2024-01-01 10:00:00"))) ===
      ((-1000001L, -1000001L, -1000001L, -1000001L, -1000001L, 1L)))
    assert(got.size === 3)
  }

  test("ohlcBars matches a brute-force oracle on random tie-heavy " +
      "data under partitionings (the r15 packed-radix bug class)") {
    // r15's radix bug (10^19 < the 2^64 tie range) inverted
    // open/close exactly when ties packed near the radix edge —
    // random data with heavy ts collisions and wild tie ids replays
    // the whole bar computation against a plain in-memory fold
    val rnd = new scala.util.Random(5150)
    val events = Seq.tabulate(400) { i =>
      val key = s"k${rnd.nextInt(3)}"
      val t = ts("2024-01-01 00:00:00").getTime +
        rnd.nextInt(8) * 3600000L + rnd.nextInt(4) * 60000L // many ties
      val tie = rnd.nextLong() // full 2^64 range: the radix stressor
      val v = (rnd.nextInt(4001) - 2000) / 100.0
      (key, new Timestamp(t), v, tie, i)
    }
    val df = events.toDF("key", "ts", "value", "event_id", "i")
      .repartition(7)
    val got = TimeSeries.ohlcBars(df, bucketSeconds = 3600,
        tie = col("event_id"))
      .as[(String, Timestamp, Long, Long, Long, Long, Long, Long)]
      .collect()
      .map(r => (r._1, r._2.getTime) ->
        ((r._3, r._4, r._5, r._6, r._7, r._8))).toMap
    def micro(v: Double): Long = math.floor(v * 1e6).toLong
    val want = events.groupBy { case (k, t, _, _, _) =>
      (k, t.getTime - Math.floorMod(t.getTime, 3600000L))
    }.map { case (kb, es) =>
      // per-bar total order: (ts, tie) with tie compared UNSIGNED?
      // no — the packed order is (micros, tie) with tie as a signed
      // long per the spec'd requireIntegralTie contract
      val ordered = es.sortBy { case (_, t, _, tie, _) => (t.getTime, tie) }
      val ms = es.map(e => micro(e._3))
      kb -> ((micro(ordered.head._3), ms.max, ms.min,
        micro(ordered.last._3), ms.sum, es.size.toLong))
    }
    assert(got.keySet === want.keySet)
    want.foreach { case (kb, w) =>
      assert(got(kb) === w, s"bar $kb")
    }
  }

  test("ohlcBars packed (ts, tie) order is monotone for EXTREME tie " +
      "ids: a same-bucket tie gap wider than 1e19 must not let an " +
      "earlier event outrank the next microsecond (radix must be " +
      "2^64, not 1e19)") {
    // same bucket: A ONE MICROSECOND earlier with a huge tie, B next
    // µs with a deeply negative tie. tie span ≈ 1.8e19 > 1e19 —
    // under a 1e19 radix A's packed order exceeds B's (m·1e19 +
    // 1.82e19 > (m+1)·1e19 + 0.02e19) and close reads 1.0
    val t0 = ts("2024-01-01 10:00:00")
    val tB = new Timestamp(t0.getTime)
    tB.setNanos(1000) // +1 µs
    val events = Seq(
      ("k", t0, 1.0, 9000000000000000000L),
      ("k", tB, 2.0, -9000000000000000000L))
      .toDF("key", "ts", "value", "event_id")
    val got = TimeSeries.ohlcBars(events, bucketSeconds = 3600,
        tie = col("event_id"))
      .as[(String, Timestamp, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(got.length === 1)
    assert(got.head._3 === 1000000L, "open must be the earlier event")
    assert(got.head._6 === 2000000L, "close must be the later event")
  }

  test("ohlcBars / acf1 refuse a NON-INTEGRAL tie loudly: the packed " +
      "(ts, tie) order casts the tie to decimal, where a string code " +
      "would go NULL or order numerically against the window's " +
      "lexicographic order") {
    val events = Seq(("k", ts("2024-01-01 00:00:00"), 1.0, "e9"))
      .toDF("key", "ts", "value", "code")
    val e1 = intercept[IllegalArgumentException] {
      TimeSeries.ohlcBars(events, 3600, tie = col("code"))
    }
    assert(e1.getMessage.contains("integral"))
    val e2 = intercept[IllegalArgumentException] {
      TimeSeries.acf1(events, tie = col("code"))
    }
    assert(e2.getMessage.contains("integral"))
  }

  test("madOutliers flags only |v - med| > mult*mad with the " +
      "PERCENTILE_DISC median on even and odd groups") {
    // key 1 (odd n=5): vs 10,12,14,16,100 → med=14 (position 3);
    //   devs 4,2,0,2,86 → sorted 0,2,2,4,86 → mad=2; flag dev > 6:
    //   only v=100 (dev 86).
    // key 2 (even n=4): vs 1,2,3,4 → med=2 (PERCENTILE_DISC(0.5) on
    //   even n takes the LOWER middle); devs 1,0,1,2 → sorted
    //   0,1,1,2 → mad=1; flag dev > 3: none.
    val df = (Seq(10L, 12L, 14L, 16L, 100L).zipWithIndex.map {
      case (v, i) => (1L, i.toLong, v)
    } ++ Seq(1L, 2L, 3L, 4L).zipWithIndex.map {
      case (v, i) => (2L, 10L + i, v)
    }).toDF("k", "id", "v")
    val got = Profiling.madOutliers(df, $"k", $"id", $"v", mult = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((4L, 1L, 100L, 14L, 86L, 2L)))
  }

  test("madOutliersFromHist multi-histogram contract: duplicate " +
      "(key, v) rows with split counts equal one merged entry " +
      "(random histograms, random splits)") {
    // the round-17 ts_anomaly fusion feeds the census UNMERGED; the
    // running-count folds must treat split counts for the same v
    // exactly like one merged row — pin it on random data
    var seed = 0x1B873593CC9E2D51L
    def nxt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    val base = (0 until 80).map(i =>
      (nxt(4).toLong, i.toLong, nxt(9).toLong - 4)).toDF("key", "id", "v")
    val merged = base.groupBy($"key", $"v")
      .agg(count(lit(1)).as("__c"))
    // split every count across 1..3 duplicate rows
    val split = merged.as[(Long, Long, Long)].collect().flatMap {
      case (k, v, c) =>
        val parts = 1 + nxt(3).min(c.toInt - 1).max(0)
        val cuts = Seq.fill(parts - 1)(1L + nxt(c.toInt - 1))
          .sorted.distinct
        val bounds = (0L +: cuts :+ c).sliding(2)
          .map(s => s(1) - s(0)).filter(_ > 0).toSeq
        bounds.map(p => (k, v, p))
    }.toSeq.toDF("key", "v", "__c").repartition(5)
    val a = Profiling.madOutliersFromHist(base, merged, mult = 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val b = Profiling.madOutliersFromHist(base, split, mult = 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(a === b)
    assert(a.nonEmpty, "degenerate fixture: no outliers at mult=1")
  }

  test("madOutliers with MAD = 0 degenerates to flagging anything " +
      "off the median") {
    // over half the mass on 5 → med=5, mad=0; 5s never flag, 7 does
    val df = Seq((9L, 0L, 5L), (9L, 1L, 5L), (9L, 2L, 5L),
      (9L, 3L, 7L)).toDF("k", "id", "v")
    val got = Profiling.madOutliers(df, $"k", $"id", $"v", mult = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((3L, 9L, 7L, 5L, 2L, 0L)))
  }

  test("madOutliers: the stats join is UNHINTED by default (AQE " +
      "runtime-size gate, no OOM cliff at scale) yet still " +
      "broadcasts at runtime when the key domain is small; the " +
      "pinned mode keeps the static broadcast") {
    // same fixture as the flag test: the default (guarded) mode must
    // carry NO static broadcast hint — at a 100×-scale key domain
    // that hint was the driver-OOM cliff — while AQE, seeing the
    // actual 2-row stats stage, still converts the join to broadcast
    // at runtime; flags identical in both modes
    val df = (Seq(10L, 12L, 14L, 16L, 100L).zipWithIndex.map {
      case (v, i) => (1L, i.toLong, v)
    } ++ Seq(1L, 2L, 3L, 4L).zipWithIndex.map {
      case (v, i) => (2L, 10L + i, v)
    }).toDF("k", "id", "v")
    val guarded = Profiling.madOutliers(df, $"k", $"id", $"v", mult = 3)
    val got = guarded.as[(Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got === Seq((4L, 1L, 100L, 14L, 86L, 2L)))
    assert(!guarded.queryExecution.optimizedPlan.toString
      .contains("strategy=broadcast"),
      "guarded mode must not carry a static broadcast hint")
    assert(guarded.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "AQE should still broadcast the 2-row stats stage at runtime")
    val pinned = Profiling.madOutliers(df, $"k", $"id", $"v",
      mult = 3, pinBroadcastStats = true)
    assert(pinned.queryExecution.optimizedPlan.toString
      .contains("strategy=broadcast"))
    assert(pinned.as[(Long, Long, Long, Long, Long, Long)]
      .collect().toSeq === got)
  }

  test("madOutliers: NULL keys are a first-class monitored series, " +
      "and NULL values neither enter the median nor flag") {
    // null-key series: 1,1,1,50 → med=1, devs 0,0,0,49 → mad=0,
    // flag 50. A null v among key 5's rows must not shift its median
    // (5,7,9 → med 7) and must never itself flag.
    val df = Seq[(Option[Long], Long, Option[Long])](
      (None, 0L, Some(1L)), (None, 1L, Some(1L)),
      (None, 2L, Some(1L)), (None, 3L, Some(50L)),
      (Some(5L), 4L, Some(5L)), (Some(5L), 5L, Some(7L)),
      (Some(5L), 6L, Some(9L)), (Some(5L), 7L, None))
      .toDF("k", "id", "v")
    val got = Profiling.madOutliers(df, $"k", $"id", $"v", mult = 3)
      .select($"id", $"key", $"v", $"med", $"mad").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq((3L, None, 50L, 1L, 0L)))
  }

  test("Quality.report: ppm row metrics, dup-row and orphan counts, " +
      "nulls fail ranges, names must be unique") {
    val df = Seq[(Option[Long], Option[Long], Long)](
      (Some(5L), Some(1L), 10L), (Some(60L), None, 10L),
      (None, Some(2L), 11L), (Some(7L), Some(3L), 12L))
      .toDF("a", "b", "k")
    val ref = Seq(10L, 12L).toDF("rk")
    val got = Quality.report(df, Seq(
      Quality.Complete("a_complete", "a", minPpm = 700000L),
      Quality.InRange("a_in_0_50", "a", 0.0, 50.0, minPpm = 500000L),
      Quality.Unique("k_unique", Seq("k")),
      Quality.SubsetOf("k_in_ref", "k", ref, "rk")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(got === Seq(
      ("a_complete", 750000L, 700000L, true),
      // null a and 60 both violate [0,50]: 2/4 = 500000 ppm, pass at =
      ("a_in_0_50", 500000L, 500000L, true),
      // k=10 appears twice → 2 rows live in dup groups
      ("k_unique", 2L, 0L, false),
      // distinct orphan values: k=11 only
      ("k_in_ref", 1L, 0L, false)))
    // empty table: row checks pass vacuously at the pinned 1000000
    val empty = Quality.report(df.filter(lit(false)), Seq(
      Quality.Complete("a_complete", "a")))
      .collect().map(r => (r.getLong(1), r.getBoolean(3))).toSeq
    assert(empty === Seq((1000000L, true)))
    intercept[IllegalArgumentException] {
      Quality.report(df, Seq(Quality.Complete("x", "a"),
        Quality.Unique("x", Seq("k"))))
    }
  }

  test("labelPropagation: two triangles over a bridge settle into " +
      "two communities by the hand-traced synchronous schedule") {
    // triangles 1-2-3 and 4-5-6, bridge 3-4; rounds traced by hand
    // with the (count desc, label asc) vote:
    // l1 = {1→2, 2→1, 3→1, 4→3, 5→4, 6→4}
    // l2 = {1→1, 2→1, 3→1, 4→4, 5→3, 6→3}
    // l3 = {1→1, 2→1, 3→1, 4→3, 5→3, 6→3}
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("u", "v")
    val got3 = Graph.labelPropagation(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got3 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    val got1 = Graph.labelPropagation(edges, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(got1 === Map(1L -> 2L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 4L, 6L -> 4L))
  }

  test("reliable-checkpoint mode: LPA / pagerank / kHop match the " +
      "localCheckpoint results, clean up superseded rounds, and the " +
      "final tables survive total block loss (re-read from files)") {
    // the executor-death scenario a 1000-executor run hits
    // mid-iteration: localCheckpoint state dies with its executor,
    // reliable checkpoints re-read from the dir. Simulated here as
    // total block eviction AFTER the run — the returned tables must
    // recompute from their checkpoint FILES alone.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt-spec").toString
    try {
      val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
        (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("u", "v")
      val directed = edges.select($"u".as("src"), $"v".as("dst"))
        .unionAll(edges.select($"v".as("src"), $"u".as("dst")))
      val nodes = (1L to 6L).toDF("node_id")

      val lpaLocal = Graph.labelPropagation(edges, iters = 3)
        .as[(Long, Long)].collect().toMap
      val lpaRel = Graph.labelPropagation(edges, iters = 3,
        checkpointDir = Some(dir))
      // 8 rounds ran (sym + seed + 3 label rounds, some released):
      // superseded round files must be GONE — only the final labels'
      // checkpoint may remain, or a 20-round production loop leaves
      // 20 corpus-sized copies in the dir
      def rddDirs() = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory)
            f +: Option(f.listFiles()).getOrElse(Array.empty).toSeq
              .flatMap(walk)
          else Seq(f)
        walk(new java.io.File(dir))
          .filter(_.getName.startsWith("rdd-"))
      }
      val afterLpa = rddDirs().length
      assert(afterLpa <= 1,
        s"superseded LPA rounds left $afterLpa checkpoint dirs")

      val prLocal = Graph.pageRank(directed, nodes, iters = 6)
        .as[(Long, Long)].collect().toMap
      val prRel = Graph.pageRank(directed, nodes, iters = 6,
        checkpointDir = Some(dir))
      val khLocal = Graph.kHopDistances(directed, Seq(1L).toDF("id"),
        hops = 2).as[(Long, Int)].collect().toMap
      val khRel = Graph.kHopDistances(directed, Seq(1L).toDF("id"),
        hops = 2, checkpointDir = Some(dir))

      // drop EVERY cached/localCheckpoint block — after this, only
      // reliable checkpoint files can serve the three tables
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      assert(lpaRel.as[(Long, Long)].collect().toMap === lpaLocal,
        "LPA diverged or failed after block loss")
      assert(prRel.as[(Long, Long)].collect().toMap === prLocal,
        "pagerank diverged or failed after block loss")
      assert(khRel.as[(Long, Int)].collect().toMap === khLocal,
        "kHop diverged or failed after block loss")

      // checkpoint-dir restore: a loop must not permanently redirect
      // an application's OWN checkpoint() calls into a dir this
      // library's cleanup deletes — the caller's dir comes back
      val ownDir = java.nio.file.Files
        .createTempDirectory("graft-caller-ckpt").toString
      try {
        spark.sparkContext.setCheckpointDir(ownDir)
        Graph.labelPropagation(edges, iters = 3,
          checkpointDir = Some(dir)).count()
        val restored = spark.sparkContext.getCheckpointDir
        assert(restored.exists(_.contains("graft-caller-ckpt")),
          s"caller's checkpoint dir not restored (got $restored)")
        // an explicit-dir run with an INVALID budget fails before any
        // materialization and still restores the caller's dir
        intercept[IllegalArgumentException] {
          Graph.pageRank(directed, nodes, iters = 0,
            checkpointDir = Some(dir))
        }
        assert(spark.sparkContext.getCheckpointDir
          .exists(_.contains("graft-caller-ckpt")))
      } finally {
        def rm2(x: java.io.File): Unit = {
          Option(x.listFiles()).foreach(_.foreach(rm2)); x.delete()
        }
        rm2(new java.io.File(ownDir))
      }
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("RoundState: concurrent DIFFERENT-dir reliable loops fail " +
      "LOUDLY naming the global-checkpoint-dir constraint; same-dir " +
      "concurrency refcounts and the public shared-dir path works") {
    val d1 = java.nio.file.Files
      .createTempDirectory("graft-rs-a").toString
    val d2 = java.nio.file.Files
      .createTempDirectory("graft-rs-b").toString
    try {
      // direct registry pins: a live loop on d1 blocks a d2 loop...
      val a = new RoundState(spark, Some(d1))
      val e = intercept[IllegalStateException] {
        new RoundState(spark, Some(d2))
      }
      assert(e.getMessage.contains("context-global") &&
        e.getMessage.contains(d1) && e.getMessage.contains(d2))
      // ...same-dir is allowed (refcounted), and the guard holds
      // until the LAST same-dir loop finishes
      val b = new RoundState(spark, Some(d1))
      // restore is registry-drained: the FIRST finisher must NOT
      // yank the global back while the second loop still
      // checkpoints into d1 (a per-instance restore would — and the
      // last finisher would then "restore" to d1 forever)
      a.done()
      assert(spark.sparkContext.getCheckpointDir.exists(_.contains(d1)),
        "first same-dir finisher restored the global too early")
      intercept[IllegalStateException] { new RoundState(spark, Some(d2)) }
      b.done()
      // fully drained: a d2 loop may now start
      new RoundState(spark, Some(d2)).done()

      // the documented safe path end-to-end: two CONCURRENT reliable
      // pageRank loops sharing ONE dir both complete and agree with
      // the local-mode result
      val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
        .toDF("src", "dst")
      val nodes = Seq(1L, 2L, 3L).toDF("node_id")
      val want = Graph.pageRank(edges, nodes, iters = 2)
        .as[(Long, Long)].collect().toMap
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val runs = (1 to 2).map { _ =>
        Future {
          Graph.pageRank(edges, nodes, iters = 2,
            checkpointDir = Some(d1)).as[(Long, Long)].collect().toMap
        }
      }
      runs.map(Await.result(_, 120.seconds))
        .foreach(got => assert(got === want))
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
      }
      rm(new java.io.File(d1)); rm(new java.io.File(d2))
    }
  }

  test("labelPropagation: string-id graphs keep the deterministic " +
      "smallest-label tie rule (no numeric-negation cast)") {
    // same two-triangles-and-a-bridge shape with string ids; the
    // hand-traced schedule maps straight over because string order
    // on "n1".."n6" matches the numeric order
    val edges = Seq(("n1", "n2"), ("n1", "n3"), ("n2", "n3"),
      ("n4", "n5"), ("n4", "n6"), ("n5", "n6"), ("n3", "n4"))
      .toDF("u", "v")
    val got = Graph.labelPropagation(edges, iters = 3)
      .as[(String, String)].collect().toMap
    assert(got === Map("n1" -> "n1", "n2" -> "n1", "n3" -> "n1",
      "n4" -> "n3", "n5" -> "n3", "n6" -> "n3"))
  }

  test("linearTrendMicro: exact OLS slope in micro centi-units/sec, " +
      "NULL on zero x-variance, mean truncates toward zero") {
    val base = ts("2024-01-01 10:00:00").getTime
    def at(s: Long) = new Timestamp(base + s * 1000L)
    val df = Seq(
      // a: perfect +1.00/10s line → slope 10 centi/s = 10000000 micro
      ("a", at(0L), 1.00), ("a", at(10L), 2.00), ("a", at(20L), 3.00),
      // b: -2.00 over 10s → -20 centi/s
      ("b", at(0L), 3.00), ("b", at(10L), 1.00),
      // c: single instant → no x-variance → NULL slope
      ("c", at(5L), 7.00),
      // d: two readings at ONE instant → den = 0 → NULL slope
      ("d", at(0L), 1.00), ("d", at(0L), 9.00),
      // e: negative values; Σy = -3 centi, mean -3 div 2 = -1
      //    (truncation toward zero, NOT floor -2)
      ("e", at(0L), -0.01), ("e", at(10L), -0.02))
      .toDF("key", "ts", "value")
    val got = TimeSeries.linearTrendMicro(df)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), r.getLong(3)))).toMap
    assert(got("a") === ((3L, Some(10000000L), 200L)))
    assert(got("b") === ((2L, Some(-20000000L), 200L)))
    assert(got("c") === ((1L, None, 700L)))
    assert(got("d") === ((2L, None, 500L)))
    // num = 2·(-20) − 10·(-3) = -10, den = 100 → floor(-0.1·10⁶)
    assert(got("e") === ((2L, Some(-100000L), -1L)))
  }

  test("keySkewProfile / ewmaFixed match brute-force oracles on " +
      "random data under partitionings") {
    val rnd = new scala.util.Random(606)
    // --- keySkewProfile: rank by (n DESC, key NULLS FIRST), exact
    // ppm + cumulative ppm by truncating division
    val keys = Seq.fill(300)(
      if (rnd.nextInt(7) == 0) None else Some(s"k${rnd.nextInt(8)}"))
    val counts = keys.groupBy(identity).view.mapValues(_.size.toLong)
      .toMap
    val tot = keys.size.toLong
    val ordered = counts.toSeq.sortBy { case (k, n) =>
      (-n, k.isDefined, k.getOrElse("")) } // NULL smallest on ties
    val wantRows = ordered.take(5).zipWithIndex.map {
      case ((k, n), i) =>
        val cum = ordered.take(i + 1).map(_._2).sum
        k -> ((n, i + 1, n * 1000000L / tot, cum * 1000000L / tot))
    }.toMap
    for (parts <- Seq(1, 6)) {
      val got = Profiling.keySkewProfile(
          keys.toDF("k").repartition(parts), col("k"), k = 5)
        .as[(Option[String], Long, Int, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      assert(got === wantRows, s"parts=$parts")
    }
    // --- ewmaFixed: sort per key by (ts, tie), fold
    // acc = (acc + v_micros) div 2 from the first value
    val events = Seq.tabulate(240) { i => (
      s"k${rnd.nextInt(4)}",
      new Timestamp(1700000000000L + rnd.nextInt(20) * 1000L), // ties
      (rnd.nextInt(2001) - 1000) / 100.0,
      rnd.nextLong() & 0xffffffL, i)
    }
    def micro(v: Double): Long = math.floor(v * 1e6).toLong
    val wantE = events.groupBy(_._1).map { case (k, es) =>
      val vs = es.sortBy(e => (e._2.getTime, e._4)).map(e => micro(e._3))
      k -> ((vs.size.toLong,
        vs.tail.foldLeft(vs.head)((acc, x) => (acc + x) / 2)))
    }
    for (parts <- Seq(1, 6)) {
      val df = events.toDF("key", "ts", "value", "tie", "i")
        .repartition(parts)
      val got = TimeSeries.ewmaFixed(df, tie = col("tie"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === wantE, s"parts=$parts")
    }
  }

  test("pageRank matches an in-memory replica of the integer " +
      "schedule on a random graph, fused and eager regimes alike") {
    // seed 1e6 per node; per round contrib(u->v) = rank(u) div
    // deg_out(u), new = 150000 + 17*sum div 20 — all truncating
    // integer division on non-negative operands, so an in-memory
    // replay is bit-exact. iters=3 runs the FUSED lazy plan, iters=8
    // the eager checkpoint regime with fixpoint probes; both must
    // equal the replica (early exit only fires on an exact fixpoint,
    // where the remaining rounds reproduce the same table).
    val rnd = new scala.util.Random(1234)
    val nodeIds = (1L to 100L)
    val edges = Seq.fill(300)(
      (nodeIds(rnd.nextInt(100)).toLong, nodeIds(rnd.nextInt(100)).toLong))
      .filter { case (u, v) => u != v }.distinct
    val degOut = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def replica(iters: Int): Map[Long, Long] = {
      var rank = nodeIds.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val s = scala.collection.mutable.Map[Long, Long]()
          .withDefaultValue(0L)
        edges.foreach { case (u, v) => s(v) += rank(u) / degOut(u) }
        rank = nodeIds.map(n => n -> (150000L + 17L * s(n) / 20L)).toMap
      }
      rank
    }
    val e = Graph.prepareEdges(
      edges.toDF("src", "dst").repartition(5)).localCheckpoint(true)
    val n = nodeIds.toDF("node_id")
    for (iters <- Seq(3, 8)) {
      val got = Graph.pageRankPrepared(e, n, iters)
        .as[(Long, Long)].collect().toMap
      val want = replica(iters)
      assert(got.keySet === nodeIds.toSet, s"iters=$iters")
      want.foreach { case (id, r) =>
        assert(got(id) === r, s"iters=$iters node=$id")
      }
    }
  }

  test("ksDrift / targetEncode match brute-force integer oracles on " +
      "random data under partitionings") {
    val rnd = new scala.util.Random(314)
    // --- ksDrift: KS = max |cumA*nB - cumB*nA| over values, ks_ppm
    // = floor(1e6*maxDiff / (nA*nB)) — replay the definition with
    // BigInt (overflow-proof reference), random ties and NULLs
    def side(): Seq[(Option[String], Option[Long])] = Seq.fill(200)((
      if (rnd.nextInt(10) == 0) None else Some(s"k${rnd.nextInt(4)}"),
      if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(9).toLong)))
    val sa = side(); val sb = side()
    def ksOracle(k: Option[String]): Option[Long] = {
      val va = sa.filter(_._1 == k).flatMap(_._2)
      val vb = sb.filter(_._1 == k).flatMap(_._2)
      if (va.isEmpty || vb.isEmpty) None
      else {
        val vs = (va ++ vb).distinct.sorted
        val diffs = vs.map { v =>
          (BigInt(va.count(_ <= v)) * vb.size -
            BigInt(vb.count(_ <= v)) * va.size).abs
        }
        Some(((diffs.max * 1000000) /
          (BigInt(va.size) * vb.size)).toLong)
      }
    }
    for (parts <- Seq(1, 6)) {
      val a = sa.toDF("k", "v").repartition(parts)
      val b = sb.toDF("k", "v").repartition(parts)
      val got = Profiling.ksDrift(a, b, $"k", $"v")
        .select($"key", $"ks_ppm").as[(Option[String], Option[Long])]
        .collect().toMap
      (sa ++ sb).map(_._1).distinct.foreach { k =>
        // keys with no non-null values on EITHER side have no row
        val inHist = (sa ++ sb).exists(r => r._1 == k && r._2.nonEmpty)
        if (inHist)
          assert(got(k) === ksOracle(k), s"parts=$parts key=$k")
      }
    }
    // --- targetEncode: LOO = (sum - v)*1e6 div (n-1); smooth =
    // (sum*gn + m*gs)*1e6 div ((n+m)*gn) — BigInt replay with the
    // same DIV truncation (floorDiv on non-negative, BigInt / here:
    // operands can be negative, Spark's div truncates toward zero
    // for decimals... use BigInt quot which truncates toward zero)
    val rows = Seq.tabulate(150) { i => (
      if (rnd.nextInt(8) == 0) None else Some(s"c${rnd.nextInt(5)}"),
      i.toLong,
      if (rnd.nextInt(10) == 0) None
      else Some((rnd.nextInt(401) - 200).toLong))
    }
    val m = 7
    val gs = BigInt(rows.flatMap(_._3).sum)
    val gn = BigInt(rows.count(_._3.nonEmpty))
    val byKey = rows.groupBy(_._1)
    for (parts <- Seq(1, 6)) {
      val df = rows.toDF("k", "id", "v").repartition(parts)
      val got = Profiling.targetEncode(df, $"k", $"id", $"v", m = m)
        .select($"id", $"enc_loo_micro", $"enc_smooth_micro")
        .as[(Long, Option[Long], Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      byKey.foreach { case (k, krows) =>
        val vs = krows.flatMap(_._3)
        val (s, n) = (BigInt(vs.sum), BigInt(vs.size))
        krows.foreach { case (_, id, vOpt) =>
          val (loo, smooth) = got(id)
          vOpt match {
            case None => assert(loo.isEmpty && smooth.isEmpty)
            case Some(v) =>
              val wantLoo = if (n > 1)
                Some((((s - v) * 1000000) / (n - 1)).toLong) else None
              assert(loo === wantLoo, s"parts=$parts loo id=$id")
              val wantSmooth =
                ((s * gn + m * gs) * 1000000) / ((n + m) * gn)
              assert(smooth === Some(wantSmooth.toLong),
                s"parts=$parts smooth id=$id")
          }
        }
      }
    }
  }

  test("targetEncode: hand-checked LOO and m-smoothed micro means; " +
      "singletons, NULL keys, and NULL targets are first-class") {
    // EXACT global mean ḡ = 172/6 (never truncated to whole units —
    // the m-estimate must pull toward the true mean): smooth =
    // ((Σ·gn + m·gΣ)·10⁶) div ((n+m)·gn)
    val df = Seq[(Option[String], Long, Option[Long])](
      (Some("a"), 1L, Some(10L)), (Some("a"), 2L, Some(20L)),
      (Some("a"), 3L, Some(30L)),
      (Some("b"), 4L, Some(100L)), // singleton → LOO NULL
      (Some("c"), 5L, None),       // null target → both NULL
      (None, 6L, Some(5L)), (None, 7L, Some(7L)))
      .toDF("k", "id", "v")
    val got = Profiling.targetEncode(df, $"k", $"id", $"v", m = 2)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)), Option(r.get(4))))).toMap
    // key a: (60·6 + 2·172)·10⁶ div (5·6) = 704·10⁶ div 30
    assert(got(1L) === ((Some(25000000L), Some(23466666L))))
    assert(got(2L) === ((Some(20000000L), Some(23466666L))))
    assert(got(3L) === ((Some(15000000L), Some(23466666L))))
    // key b: (600 + 344)·10⁶ div 18
    assert(got(4L) === ((None, Some(52444444L))))
    assert(got(5L) === ((None, None)))
    // null key: (72 + 344)·10⁶ div 24
    assert(got(6L) === ((Some(7000000L), Some(17333333L))))
    assert(got(7L) === ((Some(5000000L), Some(17333333L))))
  }

  test("decayScore: exact shift weights, 62-day cap stops the JVM " +
      "shift-wrap resurrection, post-asOf events excluded") {
    val df = Seq(
      ("a", ts("2024-01-15 08:00:00")), // age 0  → 1000000
      ("a", ts("2024-01-14 23:00:00")), // age 1  → 500000
      ("a", ts("2024-01-05 00:00:00")), // age 10 → 976
      ("a", ts("2024-01-16 00:00:00")), // after asOf → excluded
      ("b", ts("2023-01-01 00:00:00"))) // age 379, capped 62 → 0
      .toDF("key", "ts")
    val got = TimeSeries.decayScore(df, asOf = "2024-01-15")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") === ((3L, 1000000L + 500000L + 976L)))
    // without the cap a JVM shift by 379 % 64 = 59 would resurrect
    // weight; the capped shift is exactly 0
    assert(got("b") === ((1L, 0L)))
  }

  test("ksDrift: exact integer KS per key, 0 on identical " +
      "distributions, NULL when a key lives on one side only") {
    val a = Seq[(String, Option[Long])](
      ("x", Some(1L)), ("x", Some(2L)),
      ("y", Some(1L)), ("y", Some(1L)), ("y", Some(2L)),
      ("z", Some(9L)), ("y", None)) // null v ignored
      .toDF("k", "v")
    val b = Seq[(String, Option[Long])](
      ("x", Some(1L)), ("x", Some(2L)),
      ("y", Some(2L)), ("y", Some(3L)))
      .toDF("k", "v")
    val got = Profiling.ksDrift(a, b, $"k", $"v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    assert(got("x") === ((2L, 2L, Some(0L))))
    // y: cum cross-diffs |2·2−0·3|=4, |3·2−1·3|=3, |3·2−2·3|=0 →
    // max 4 → 4000000 div 6 (KS = 2/3)
    assert(got("y") === ((3L, 2L, Some(666666L))))
    assert(got("z") === ((1L, 0L, None)))
  }

  test("winsorize clamps to exact PERCENTILE_DISC band; NULL keys " +
      "and NULL values are first-class") {
    // key 1: 10..100 by 10 (n=10); p25 → cume ≥ 0.25 first at 30,
    // p75 → first at 80; clamp 10,20→30 and 90,100→80
    val k1 = (1 to 10).map(i => (Option(1L), i.toLong, Option(i * 10L)))
    val rest = Seq[(Option[Long], Long, Option[Long])](
      (None, 90L, Some(5L)), (None, 91L, Some(6L)),
      (None, 92L, Some(7L)), (None, 93L, Some(8L)),
      (Some(2L), 94L, None), (Some(2L), 95L, Some(4L)),
      (Some(3L), 96L, None)) // key 3: ALL values null → null band
    val df = (k1 ++ rest).toDF("k", "id", "v")
    val got = Profiling.winsorize(df, $"k", $"id", $"v",
        loBp = 2500, hiBp = 7500)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4)), Option(r.get(5))))).toMap
    assert(got(1L)._5 === Some(30L)) // v=10 pulled up to lo
    assert(got(2L)._5 === Some(30L))
    assert(got(5L)._5 === Some(50L)) // interior untouched
    assert(got(9L)._5 === Some(80L)) // v=90 pulled down to hi
    assert(got(10L)._5 === Some(80L))
    // NULL key group: band over its own 4 values — cume_dist(5) =
    // 0.25 ≥ 0.25 so p25 → 5, cume_dist(7) = 0.75 → p75 → 7
    assert(got(90L) === ((None, Some(5L), Some(5L), Some(7L), Some(5L))))
    // NULL v passes through as NULL even with a real band
    assert(got(94L)._5 === None)
    assert(got(95L) ===
      ((Some(2L), Some(4L), Some(4L), Some(4L), Some(4L))))
    // all-null key survives with a NULL band, not row-loss
    assert(got(96L) === ((Some(3L), None, None, None, None)))
    assert(got.size === 17)
  }
}
