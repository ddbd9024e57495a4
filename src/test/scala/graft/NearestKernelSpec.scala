package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NearestColumns
import org.apache.spark.sql.types._

/** Focused spec for the round-19 native nearest-candidate kernels
  * (VecArgmaxCos / VecArgminL2) — the in-row replacements for the
  * broadcast-expansion `crossJoin + min_by/max_by(cid, struct(...))`
  * argmax shape. Pins the exact aggregate semantics the kernels
  * replicate: the metric fold arithmetic, the (metric, cid) tie
  * order, the struct-ordering NULL tier (a null-metric candidate was
  * never IGNORED by min_by/max_by — a struct with a null field is
  * not a null ordering — it just sorts FIRST), and eval/codegen
  * agreement.
  */
class NearestKernelSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def centsDf(rows: Seq[(Long, Seq[Double])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("__cid", LongType, nullable = false),
      StructField("__cv", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))),
      schema)
  }

  private def ptsDf(rows: Seq[(Long, Seq[Double])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))),
      schema)
  }

  /** The reference semantics: the old aggregation's argmax, computed
    * with the identical double arithmetic (left-to-right folds,
    * dot/(pn·cn)), the SQL double ordering ladder, and the
    * struct-ordering null tier.
    */
  private def cmpD(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1 else if (x == y) 0
    else java.lang.Double.compare(x, y)

  private def refArgmaxCos(v: Seq[Double],
                           cents: Seq[(Long, Seq[Double])]): Option[Long] = {
    val pn = math.sqrt(v.foldLeft(0.0)((s, x) => s + x * x))
    var best: Option[(Double, Long)] = None
    var nullBest: Option[Long] = None
    cents.foreach { case (cid, cv) =>
      if (cv.length != v.length) {
        if (nullBest.forall(cid < _)) nullBest = Some(cid)
      } else {
        val cn = math.sqrt(cv.foldLeft(0.0)((s, x) => s + x * x))
        var dot = 0.0
        var i = 0
        while (i < v.length) { dot += v(i) * cv(i); i += 1 }
        val cos = dot / (pn * cn)
        val better = best match {
          case None => true
          case Some((b, bc)) =>
            val c = cmpD(cos, b); c > 0 || (c == 0 && cid < bc)
        }
        if (better) best = Some((cos, cid))
      }
    }
    best.map(_._2).orElse(nullBest)
  }

  private def refArgminL2(sv: Seq[Double],
                          cents: Seq[(Long, Seq[Double])]): Option[Long] = {
    var best: Option[(Double, Long)] = None
    var nullBest: Option[Long] = None
    cents.foreach { case (cid, cv) =>
      if (cv.length != sv.length) {
        if (nullBest.forall(cid < _)) nullBest = Some(cid)
      } else {
        var s = 0.0
        var i = 0
        while (i < sv.length) {
          val d = sv(i) - cv(i); s += d * d; i += 1
        }
        val better = best match {
          case None => true
          case Some((b, bc)) =>
            val c = cmpD(s, b); c < 0 || (c == 0 && cid < bc)
        }
        if (better) best = Some((s, cid))
      }
    }
    // in a MINIMUM the null metric sorts FIRST: it dominates
    nullBest.orElse(best.map(_._2))
  }

  private def runArgmaxCos(pts: Seq[(Long, Seq[Double])],
                           cents: Seq[(Long, Seq[Double])])
      : Map[Long, Option[Long]] = {
    val cb = centsDf(cents)
      .withColumn("__cn",
        graft.functions.VectorFunctions.vec_norm(col("__cv")))
      .agg(collect_list(struct(col("__cid"), col("__cv"), col("__cn")))
        .as("__cb"))
    ptsDf(pts)
      .withColumn("__pn",
        graft.functions.VectorFunctions.vec_norm(col("vec")))
      .crossJoin(broadcast(cb))
      .select(col("id"),
        NearestColumns.vec_argmax_cos(col("vec"), col("__pn"), col("__cb"))
          .as("cid"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
  }

  private def runArgminL2(pts: Seq[(Long, Seq[Double])],
                          cents: Seq[(Long, Seq[Double])])
      : Map[Long, Option[Long]] = {
    val cb = centsDf(cents)
      .agg(collect_list(struct(col("__cid"), col("__cv"))).as("__cb"))
    ptsDf(pts)
      .crossJoin(broadcast(cb))
      .select(col("id"),
        NearestColumns.vec_argmin_l2(col("vec"), col("__cb")).as("cid"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
  }

  private val rng = new scala.util.Random(20260819L)
  private def randVec(d: Int): Seq[Double] =
    Seq.fill(d)(rng.nextDouble() * 2 - 1)

  test("vec_argmax_cos matches the max_by(cid, struct(cos, -cid)) " +
      "reference on random vectors, engineered exact ties, and a " +
      "mismatched-dims candidate (the struct-ordering null tier)") {
    val sharedVec = randVec(8) // duplicate centroid vector → exact tie
    val cents = Seq(
      (15L, sharedVec), (12L, sharedVec), // tie pair: 12 must win ties
      (11L, randVec(5)), // dims mismatch → null-metric tier
      (10L, randVec(8)), (14L, randVec(8)), (13L, randVec(8)))
    val pts = (1L to 60L).map(i => (i, randVec(8))) ++
      // a point EQUAL to the shared centroid vector: cos exactly 1.0
      // against both 12 and 15 — the tie-break must pick 12
      Seq((100L, sharedVec))
    val got = runArgmaxCos(pts, cents)
    pts.foreach { case (id, v) =>
      assert(got(id) === refArgmaxCos(v, cents), s"point $id")
    }
    assert(got(100L) === Some(12L))
  }

  test("vec_argmax_cos: only mismatched-dims candidates -> smallest " +
      "cid wins (never NULL); empty candidate set -> no assignment") {
    val cents = Seq((7L, randVec(3)), (5L, randVec(4)))
    val got = runArgmaxCos(Seq((1L, randVec(8))), cents)
    assert(got(1L) === Some(5L))
  }

  test("vec_argmin_l2 matches the min_by(cid, struct(l2, cid)) " +
      "reference, including the null-tier DOMINANCE in a minimum " +
      "(null sorts first) and exact-tie cid order") {
    val sharedVec = randVec(4)
    val cents = Seq(
      (9L, sharedVec), (3L, sharedVec), // exact tie: 3 wins
      (6L, randVec(4)), (8L, randVec(4)))
    val pts = (1L to 60L).map(i => (i, randVec(4)))
    val got = runArgminL2(pts, cents)
    pts.foreach { case (id, sv) =>
      assert(got(id) === refArgminL2(sv, cents), s"point $id")
    }
    // with a mismatched candidate present, it DOMINATES the min —
    // the (null, cid) struct sorts before every (real, cid)
    val centsN = cents :+ (4L, randVec(2)) :+ (2L, randVec(3))
    val gotN = runArgminL2(pts.take(5), centsN)
    pts.take(5).foreach { case (id, _) => assert(gotN(id) === Some(2L)) }
  }

  test("kernels agree between codegen and interpreted eval") {
    val cents = Seq((1L, randVec(8)), (2L, randVec(8)), (3L, randVec(5)))
    val pts = (1L to 20L).map(i => (i, randVec(8)))
    val viaCodegen = runArgmaxCos(pts, cents)
    val viaCodegenL2 = runArgminL2(pts, cents)
    val conf = spark.conf
    val before = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val beforeWs = conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      conf.set("spark.sql.codegen.wholeStage", "false")
      assert(runArgmaxCos(pts, cents) === viaCodegen)
      assert(runArgminL2(pts, cents) === viaCodegenL2)
    } finally {
      conf.set("spark.sql.codegen.factoryMode", before)
      conf.set("spark.sql.codegen.wholeStage", beforeWs)
    }
  }
}
