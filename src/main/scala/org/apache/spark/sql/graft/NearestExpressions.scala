// In the org.apache.spark.sql package tree for the same reason as
// VectorExpressions: Column construction over custom Expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native nearest-candidate kernels (round 19).
  *
  * The broadcast-expansion argmax — `crossJoin(broadcast(cands))` +
  * `groupBy(id).agg(max_by(cid, struct(score, -cid)))` — multiplies
  * every corpus row by the candidate count, shuffles the expanded
  * stream (the aggregation's exchange), and because a struct ordering
  * is not a mutable aggregation buffer, the aggregate falls back to
  * SortAggregate: the n·k scored stream is SORTED twice (partial +
  * final). These kernels fold the argmax IN-ROW over a
  * broadcast-joined candidate ARRAY instead: no row expansion, no
  * exchange, no sort — one tight codegen'd loop per corpus row. (The
  * HOF form — `array_min(transform(...))` — was measured 4× slower in
  * an earlier round: lambdas interpret the metric per element. These
  * are the native kernels that comment asked for.)
  *
  * Numeric contract, bit-for-bit identical to the aggregates they
  * replace (and to the DuckDB oracles): the metric is VecDot/VecL2Sq's
  * left-to-right double fold; cosine is dot / (vn * cn) in that
  * association; comparisons replicate Spark's SQL double ordering
  * (−0.0 == 0.0, NaN greatest — the `(x<y)?(x>y)?(x==y)?` ladder with
  * a Double.compare fallback); ties go to the SMALLER candidate id —
  * exactly `max_by(cid, struct(score, -cid))` / `min_by(cid,
  * struct(score, cid))`. A candidate whose metric is NULL (length
  * mismatch, null element) mirrors the STRUCT-ordering rule of the
  * aggregates (a struct with a null field is not a null ordering, so
  * such rows were never ignored — the null field just sorts FIRST):
  * in the cosine ARGMAX a null-metric candidate ranks below every
  * real one but still wins (smallest cid) when no real candidate
  * exists; in the L2 ARGMIN a null-metric candidate ranks above
  * every real one (null sorts first in a minimum). A candidate whose
  * cid is null is ignored (no caller produces one). Empty array →
  * NULL, the empty-buffer rule.
  */
private[graft] object NearestKernelUtil {
  /** Spark SQL's double ordering: primitive compares (±0.0 equal),
    * NaN greatest via Double.compare fallback.
    */
  @inline def cmpD(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1 else if (x == y) 0
    else java.lang.Double.compare(x, y)

  /** The same ladder as inline Java source. */
  def cmpDJava(x: String, y: String): String =
    s"(($x < $y) ? -1 : ($x > $y) ? 1 : ($x == $y) ? 0 : " +
      s"java.lang.Double.compare($x, $y))"

  def isFloatArray(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].elementType == FloatType

  /** Read an integral struct field as long (candidate ids are
    * integral by the callers' contract).
    */
  @inline def idAsLong(r: InternalRow, ord: Int, dt: DataType): Long =
    dt match {
      case LongType => r.getLong(ord)
      case IntegerType => r.getInt(ord).toLong
      case ShortType => r.getShort(ord).toLong
      case ByteType => r.getByte(ord).toLong
      case other => throw new IllegalStateException(
        s"candidate id must be integral, got $other")
    }

  def idGetterJava(dt: DataType): String = dt match {
    case LongType => "getLong"
    case IntegerType => "getInt"
    case ShortType => "getShort"
    case ByteType => "getByte"
    case other => throw new IllegalStateException(
      s"candidate id must be integral, got $other")
  }

  def candStruct(dt: DataType): StructType =
    dt.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
}

import NearestKernelUtil._

/** argmax over broadcast candidates by cosine: for point vector `v`
  * with precomputed norm `vn`, and `cands` an
  * array<struct<cid, cv: array<float|double>, cn: double>>, return
  * the cid maximizing dot(v, cv) / (vn * cn), ties to the smaller
  * cid — `max_by(cid, struct(cos, -cid))` over the expanded rows,
  * in-row.
  */
case class VecArgmaxCos(v: Expression, vn: Expression, cands: Expression)
    extends TernaryExpression {

  override def first: Expression = v
  override def second: Expression = vn
  override def third: Expression = cands
  override def prettyName: String = "vec_argmax_cos"
  override def nullable: Boolean = true

  private def cand: StructType = candStruct(cands.dataType)
  override def dataType: DataType = cand.fields(0).dataType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val ok = v.dataType.isInstanceOf[ArrayType] &&
      vn.dataType == DoubleType &&
      cands.dataType.isInstanceOf[ArrayType] &&
      cands.dataType.asInstanceOf[ArrayType].elementType
        .isInstanceOf[StructType] && cand.fields.length == 3 &&
      cand.fields(1).dataType.isInstanceOf[ArrayType] &&
      cand.fields(2).dataType == DoubleType
    if (ok) TypeCheckSuccess
    else TypeCheckFailure("vec_argmax_cos(v: array, vn: double, " +
      "cands: array<struct<cid, cv: array, cn: double>>)")
  }

  override def eval(input: InternalRow): Any = {
    val vv = v.eval(input)
    val nv = vn.eval(input)
    val ca = cands.eval(input)
    if (vv == null || nv == null || ca == null) return null
    val x = vv.asInstanceOf[ArrayData]
    val pn = nv.asInstanceOf[Double]
    val arr = ca.asInstanceOf[ArrayData]
    val vf = isFloatArray(v.dataType)
    val cvf = isFloatArray(cand.fields(1).dataType)
    val vNullable = VecKernelUtil.mayNull(v)
    val cvNullable =
      cand.fields(1).dataType.asInstanceOf[ArrayType].containsNull
    val idDt = cand.fields(0).dataType
    val n = x.numElements()
    var best = 0.0
    var bestCid = 0L
    var has = false
    var hasNull = false
    var nullCid = 0L
    var c = 0
    val k = arr.numElements()
    while (c < k) {
      if (!arr.isNullAt(c)) {
        val row = arr.getStruct(c, 3)
        if (!row.isNullAt(0)) {
          val cid = idAsLong(row, 0, idDt)
          var nul = row.isNullAt(1) || row.isNullAt(2)
          if (!nul) {
            val cv = row.getArray(1)
            if (cv.numElements() != n) nul = true
            else {
              val cn = row.getDouble(2)
              var s = 0.0
              var i = 0
              while (i < n && !nul) {
                if ((vNullable && x.isNullAt(i)) ||
                    (cvNullable && cv.isNullAt(i))) nul = true
                else {
                  val xi = if (vf) x.getFloat(i).toDouble else x.getDouble(i)
                  val yi = if (cvf) cv.getFloat(i).toDouble
                    else cv.getDouble(i)
                  s += xi * yi
                  i += 1
                }
              }
              if (!nul) {
                val cos = s / (pn * cn)
                val cmp = if (has) cmpD(cos, best) else 1
                if (cmp > 0 || (cmp == 0 && cid < bestCid)) {
                  best = cos; bestCid = cid; has = true
                }
              }
            }
          }
          if (nul && (!hasNull || cid < nullCid)) {
            nullCid = cid; hasNull = true
          }
        }
      }
      c += 1
    }
    // a null-metric candidate ranks BELOW every real one in the max
    // (null sorts first), but wins (smallest cid) when no real exists
    if (has || hasNull) {
      if (!has) bestCid = nullCid
    } else return null
    idDt match {
      case LongType => bestCid
      case IntegerType => bestCid.toInt
      case ShortType => bestCid.toShort
      case ByteType => bestCid.toByte
      case _ => bestCid
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, nv, ca) => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val cosV = ctx.freshName("cos")
      val cmp = ctx.freshName("cmp")
      val row = ctx.freshName("row")
      val cv = ctx.freshName("cv")
      val cn = ctx.freshName("cn")
      val cid = ctx.freshName("cid")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val has = ctx.freshName("has")
      val nul = ctx.freshName("nul")
      val gv = if (isFloatArray(v.dataType)) "getFloat" else "getDouble"
      val gc = if (isFloatArray(cand.fields(1).dataType)) "getFloat"
        else "getDouble"
      val gid = idGetterJava(cand.fields(0).dataType)
      val jt = CodeGenerator.javaType(dataType)
      // schema-gated element null probes, the VecDot discipline
      val hasNull = ctx.freshName("hasNull")
      val nullCid = ctx.freshName("nullCid")
      val vGuard = if (VecKernelUtil.mayNull(v))
        s"if ($xv.isNullAt($i)) { $nul = true; break; }" else ""
      val cGuard =
        if (cand.fields(1).dataType.asInstanceOf[ArrayType].containsNull)
          s"if ($cv.isNullAt($i)) { $nul = true; break; }" else ""
      s"""
         |int $n = $xv.numElements();
         |double $best = 0.0;
         |long $bestCid = 0L;
         |boolean $has = false;
         |boolean $hasNull = false;
         |long $nullCid = 0L;
         |int $k = $ca.numElements();
         |for (int $c = 0; $c < $k; $c++) {
         |  if ($ca.isNullAt($c)) continue;
         |  org.apache.spark.sql.catalyst.InternalRow $row = $ca.getStruct($c, 3);
         |  if ($row.isNullAt(0)) continue;
         |  long $cid = (long) $row.$gid(0);
         |  boolean $nul = $row.isNullAt(1) || $row.isNullAt(2);
         |  if (!$nul) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $cv =
         |      $row.getArray(1);
         |    if ($cv.numElements() != $n) { $nul = true; } else {
         |      double $cn = $row.getDouble(2);
         |      double $s = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        $vGuard
         |        $cGuard
         |        $s += (double) $xv.$gv($i) * (double) $cv.$gc($i);
         |      }
         |      if (!$nul) {
         |        double $cosV = $s / ($nv * $cn);
         |        int $cmp = $has ? ${cmpDJava(cosV, best)} : 1;
         |        if ($cmp > 0 || ($cmp == 0 && $cid < $bestCid)) {
         |          $best = $cosV; $bestCid = $cid; $has = true;
         |        }
         |      }
         |    }
         |  }
         |  if ($nul && (!$hasNull || $cid < $nullCid)) {
         |    $nullCid = $cid; $hasNull = true;
         |  }
         |}
         |if ($has) { ${ev.value} = ($jt) $bestCid; }
         |else if ($hasNull) { ${ev.value} = ($jt) $nullCid; }
         |else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): VecArgmaxCos =
    copy(v = newFirst, vn = newSecond, cands = newThird)
}

/** argmin over broadcast candidates by squared L2: for subvector `sv`
  * and `cands` an array<struct<cid, cv: array<float|double>>>, return
  * the cid minimizing Σ(svᵢ−cvᵢ)², ties to the smaller cid —
  * `min_by(cid, struct(l2sq, cid))` over the expanded rows, in-row.
  */
case class VecArgminL2(sv: Expression, cands: Expression)
    extends BinaryExpression {

  override def left: Expression = sv
  override def right: Expression = cands
  override def prettyName: String = "vec_argmin_l2"
  override def nullable: Boolean = true

  private def cand: StructType = candStruct(cands.dataType)
  override def dataType: DataType = cand.fields(0).dataType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val ok = sv.dataType.isInstanceOf[ArrayType] &&
      cands.dataType.isInstanceOf[ArrayType] &&
      cands.dataType.asInstanceOf[ArrayType].elementType
        .isInstanceOf[StructType] && cand.fields.length == 2 &&
      cand.fields(1).dataType.isInstanceOf[ArrayType]
    if (ok) TypeCheckSuccess
    else TypeCheckFailure("vec_argmin_l2(sv: array, " +
      "cands: array<struct<cid, cv: array>>)")
  }

  override def eval(input: InternalRow): Any = {
    val vv = sv.eval(input)
    val ca = cands.eval(input)
    if (vv == null || ca == null) return null
    val x = vv.asInstanceOf[ArrayData]
    val arr = ca.asInstanceOf[ArrayData]
    val vf = isFloatArray(sv.dataType)
    val cvf = isFloatArray(cand.fields(1).dataType)
    val vNullable = VecKernelUtil.mayNull(sv)
    val cvNullable =
      cand.fields(1).dataType.asInstanceOf[ArrayType].containsNull
    val idDt = cand.fields(0).dataType
    val n = x.numElements()
    var best = 0.0
    var bestCid = 0L
    var has = false
    var hasNull = false
    var nullCid = 0L
    var c = 0
    val k = arr.numElements()
    while (c < k) {
      if (!arr.isNullAt(c)) {
        val row = arr.getStruct(c, 2)
        if (!row.isNullAt(0)) {
          val cid = idAsLong(row, 0, idDt)
          var nul = row.isNullAt(1)
          if (!nul) {
            val cv = row.getArray(1)
            if (cv.numElements() != n) nul = true
            else {
              var s = 0.0
              var i = 0
              while (i < n && !nul) {
                if ((vNullable && x.isNullAt(i)) ||
                    (cvNullable && cv.isNullAt(i))) nul = true
                else {
                  val xi = if (vf) x.getFloat(i).toDouble else x.getDouble(i)
                  val yi = if (cvf) cv.getFloat(i).toDouble
                    else cv.getDouble(i)
                  val d = xi - yi
                  s += d * d
                  i += 1
                }
              }
              if (!nul) {
                val cmp = if (has) cmpD(s, best) else -1
                if (cmp < 0 || (cmp == 0 && cid < bestCid)) {
                  best = s; bestCid = cid; has = true
                }
              }
            }
          }
          if (nul && (!hasNull || cid < nullCid)) {
            nullCid = cid; hasNull = true
          }
        }
      }
      c += 1
    }
    // a null-metric candidate ranks ABOVE every real one in the min
    // (null sorts first in an ascending struct ordering)
    if (hasNull || has) {
      if (hasNull) bestCid = nullCid
    } else return null
    idDt match {
      case LongType => bestCid
      case IntegerType => bestCid.toInt
      case ShortType => bestCid.toShort
      case ByteType => bestCid.toByte
      case _ => bestCid
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, ca) => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val cmp = ctx.freshName("cmp")
      val row = ctx.freshName("row")
      val cv = ctx.freshName("cv")
      val cid = ctx.freshName("cid")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val has = ctx.freshName("has")
      val nul = ctx.freshName("nul")
      val gv = if (isFloatArray(sv.dataType)) "getFloat" else "getDouble"
      val gc = if (isFloatArray(cand.fields(1).dataType)) "getFloat"
        else "getDouble"
      val gid = idGetterJava(cand.fields(0).dataType)
      val jt = CodeGenerator.javaType(dataType)
      val hasNull = ctx.freshName("hasNull")
      val nullCid = ctx.freshName("nullCid")
      val vGuard = if (VecKernelUtil.mayNull(sv))
        s"if ($xv.isNullAt($i)) { $nul = true; break; }" else ""
      val cGuard =
        if (cand.fields(1).dataType.asInstanceOf[ArrayType].containsNull)
          s"if ($cv.isNullAt($i)) { $nul = true; break; }" else ""
      s"""
         |int $n = $xv.numElements();
         |double $best = 0.0;
         |long $bestCid = 0L;
         |boolean $has = false;
         |boolean $hasNull = false;
         |long $nullCid = 0L;
         |int $k = $ca.numElements();
         |for (int $c = 0; $c < $k; $c++) {
         |  if ($ca.isNullAt($c)) continue;
         |  org.apache.spark.sql.catalyst.InternalRow $row = $ca.getStruct($c, 2);
         |  if ($row.isNullAt(0)) continue;
         |  long $cid = (long) $row.$gid(0);
         |  boolean $nul = $row.isNullAt(1);
         |  if (!$nul) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $cv =
         |      $row.getArray(1);
         |    if ($cv.numElements() != $n) { $nul = true; } else {
         |      double $s = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        $vGuard
         |        $cGuard
         |        double $d = (double) $xv.$gv($i) - (double) $cv.$gc($i);
         |        $s += $d * $d;
         |      }
         |      if (!$nul) {
         |        int $cmp = $has ? ${cmpDJava(s, best)} : -1;
         |        if ($cmp < 0 || ($cmp == 0 && $cid < $bestCid)) {
         |          $best = $s; $bestCid = $cid; $has = true;
         |        }
         |      }
         |    }
         |  }
         |  if ($nul && (!$hasNull || $cid < $nullCid)) {
         |    $nullCid = $cid; $hasNull = true;
         |  }
         |}
         |if ($hasNull) { ${ev.value} = ($jt) $nullCid; }
         |else if ($has) { ${ev.value} = ($jt) $bestCid; }
         |else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecArgminL2 =
    copy(sv = newLeft, cands = newRight)
}

/** Column wrappers (the VectorColumns pattern). */
object NearestColumns {
  def vec_argmax_cos(v: Column, vn: Column, cands: Column): Column =
    ExpressionUtils.column(VecArgmaxCos(
      ExpressionUtils.expression(v), ExpressionUtils.expression(vn),
      ExpressionUtils.expression(cands)))

  def vec_argmin_l2(sv: Column, cands: Column): Column =
    ExpressionUtils.column(VecArgminL2(
      ExpressionUtils.expression(sv), ExpressionUtils.expression(cands)))
}
