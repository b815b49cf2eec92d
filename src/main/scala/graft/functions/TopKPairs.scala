package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Custom aggregate function (`graft_topk(sort_val, tie_val, k)`): the
  * top-k (sort_val, tie_val) pairs per group, ordered by sort_val DESC
  * with tie_val ASC as the total tie-break.
  *
  * Why a custom [[TypedImperativeAggregate]] (the aggregation tier of the
  * SURVEY §4.2 escape-hatch ladder): the composable top-k-per-group
  * formulations either sort every group row under a Window
  * (`row_number() <= k` — WindowGroupLimit prunes some of it, but the
  * plan still shuffles and sorts FULL rows) or collect whole groups
  * (`slice(sort_array(collect_list(...)))` — unbounded agg state). This
  * aggregate carries AT MOST k pairs of longs per group at every stage:
  * the partial (map-side) aggregate already truncates to k, so the
  * shuffle moves `O(groups × k)` longs no matter how many rows a group
  * has — the property that matters when one group holds a billion rows.
  * State is bounded, merges are k-bounded, and the result is a sorted
  * `array<struct<sort_val, tie_val>>` whose order is total and therefore
  * deterministic under any partitioning.
  */
case class TopKPairs(
    sortExpr: Expression,
    tieExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]] {

  require(k > 0 && k <= 1024, s"graft_topk: k must be in [1, 1024], got $k")

  override def children: Seq[Expression] = Seq(sortExpr, tieExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (sortExpr.dataType == LongType && tieExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk expects (bigint, bigint, int literal), got " +
        s"(${sortExpr.dataType.simpleString}, ${tieExpr.dataType.simpleString})")

  override def dataType: DataType = ArrayType(new StructType()
    .add("sort_val", LongType, nullable = false)
    .add("tie_val", LongType, nullable = false), containsNull = false)

  // sort_val DESC, tie_val ASC — a total order, so eval() is deterministic
  private val ord: Ordering[(Long, Long)] =
    Ordering.fromLessThan((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    ArrayBuffer.empty[(Long, Long)]

  override def update(
      buf: ArrayBuffer[(Long, Long)], input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val s = sortExpr.eval(input)
    val t = tieExpr.eval(input)
    if (s != null && t != null) {
      val p = (s.asInstanceOf[Long], t.asInstanceOf[Long])
      if (buf.size < k) {
        buf += p
        buf.sortInPlace()(ord)
      } else if (ord.lt(p, buf.last)) {
        buf(k - 1) = p
        buf.sortInPlace()(ord)
      }
    }
    buf
  }

  override def merge(
      b1: ArrayBuffer[(Long, Long)],
      b2: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    b1 ++= b2
    b1.sortInPlace()(ord)
    if (b1.size > k) b1.takeInPlace(k)
    b1
  }

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any =
    new GenericArrayData(buf.sorted(ord).map(p => InternalRow(p._1, p._2)).toArray)

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { p => bb.putLong(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Long, Long)](n)
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(sortExpr = newChildren(0), tieExpr = newChildren(1))
}

object TopKPairs {
  /** Register `graft_topk(sort, tie, k)` (k a positive int literal) in the
    * session's function registry. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_topk")))
      reg.createOrReplaceTempFunction("graft_topk", exprs => {
        val k = exprs(2) match {
          case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
          case other => throw new IllegalArgumentException(
            s"graft_topk: k must be a literal, got $other")
        }
        // return the raw AggregateFunction: the analyzer's ResolveFunctions
        // wraps it in an AggregateExpression (same path as builtin max/min)
        TopKPairs(exprs(0), exprs(1), k)
      }, "scala_udf")
  }
}
