// In the org.apache.spark.sql package tree: extends the sql-private
// Collect aggregate base (serialize/deserialize machinery) and needs
// ExpressionUtils for Column construction.
package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, ByteType, BinaryType, DataType, MapType}

/** `collect_set` with a hard per-group element cap — the missing
  * primitive for df-capped inverted indexes (n-gram Jaccard postings,
  * co-occurrence groups): a group's set stops growing at `maxSize`
  * distinct elements, so a pathologically hot key (a stopword shingle
  * in every document of a 100 TB corpus) costs O(maxSize) task
  * memory instead of materializing millions of ids before a
  * post-aggregation filter drops them.
  *
  * Exactness of the cap-and-drop idiom
  * (`filter(size(...) <= limit)` with `maxSize = limit + 1`): the
  * final size is `min(true distinct count, maxSize)` — update and
  * merge only ever SKIP insertions once the buffer already holds
  * `maxSize` elements, and a skipped element can never bring the size
  * back under `maxSize` — so `size <= limit` iff the group's true
  * distinct count is `<= limit`. Kept groups carry their COMPLETE
  * distinct set; only to-be-dropped groups are truncated.
  *
  * Partial aggregation stays enabled (each map-side partial buffer is
  * itself capped), and the buffer wire format is the parent
  * [[Collect]] class's — only the insertion guard differs from the
  * built-in `CollectSet`.
  */
case class BoundedCollectSet(
    child: Expression,
    maxSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.HashSet[Any]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(maxSize >= 1, s"maxSize ($maxSize) must be >= 1")

  override def createAggregationBuffer(): mutable.HashSet[Any] =
    mutable.HashSet.empty

  override lazy val bufferElementType: DataType = child.dataType match {
    case BinaryType => ArrayType(ByteType)
    case other => other
  }

  override def convertToBufferElement(value: Any): Any =
    child.dataType match {
      // HashSet membership needs value equality; unsafe binary rows
      // piggyback the same array encoding the built-in CollectSet uses
      case BinaryType =>
        UnsafeArrayData.fromPrimitiveArray(value.asInstanceOf[Array[Byte]])
      case _ => InternalRow.copyValue(value)
    }

  override def update(buffer: mutable.HashSet[Any],
                      input: InternalRow): mutable.HashSet[Any] = {
    if (buffer.size < maxSize) {
      val value = child.eval(input)
      if (value != null) buffer += convertToBufferElement(value)
    }
    buffer
  }

  override def merge(buffer: mutable.HashSet[Any],
                     other: mutable.HashSet[Any]): mutable.HashSet[Any] = {
    val it = other.iterator
    while (buffer.size < maxSize && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.HashSet[Any]): Any = {
    val array = child.dataType match {
      case BinaryType =>
        buffer.iterator.map(_.asInstanceOf[ArrayData].toByteArray()).toArray
      case _ => buffer.toArray
    }
    new GenericArrayData(array.asInstanceOf[Array[Any]])
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.existsRecursively(_.isInstanceOf[MapType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bounded_collect_set does not support map-typed columns")

  override def defaultResult: Option[Literal] =
    Option(Literal.create(Array.empty[Any], dataType))

  override def prettyName: String = "bounded_collect_set"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(
      newChild: Expression): BoundedCollectSet = copy(child = newChild)
}

object AggColumns {
  /** Column-API entry: `bounded_collect_set(c, maxSize)`. For the
    * cap-and-drop idiom pass `limit + 1` and filter
    * `size(result) <= limit` — see [[BoundedCollectSet]].
    */
  def bounded_collect_set(c: Column, maxSize: Int): Column =
    ExpressionUtils.column(
      BoundedCollectSet(ExpressionUtils.expression(c), maxSize)
        .toAggregateExpression())
}
