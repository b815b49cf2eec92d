package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Bounded last-k buffer: three parallel unboxed long arrays kept sorted
  * ASCENDING by (sort_val, tie_val, payload), holding the k LARGEST
  * triples seen. The per-row path mirrors [[TopKBuffer]] (bounds check +
  * binary-search insert + `arraycopy`, no allocation, no boxing); the
  * difference is the polarity (largest kept, smallest evicted) and the
  * third carried column.
  */
final class LastKBuffer(val k: Int) {
  val sorts = new Array[Long](k)
  val ties = new Array[Long](k)
  val pays = new Array[Long](k)
  var size: Int = 0

  // total order: (sort, tie, payload) ascending. true iff the triple
  // sorts strictly BEFORE slot i.
  @inline private def before(s: Long, t: Long, p: Long, i: Int): Boolean =
    s < sorts(i) || (s == sorts(i) &&
      (t < ties(i) || (t == ties(i) && p < pays(i))))

  def insert(s: Long, t: Long, p: Long): Unit = {
    // full and not after the current minimum (slot 0): evicted on entry
    if (size == k && before(s, t, p, 0)) return
    // binary search for the first slot the triple sorts before — that is
    // its insertion point in the ascending buffer
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (before(s, t, p, mid)) hi = mid else lo = mid + 1
    }
    if (size < k) {
      // room: shift [lo, size) right
      System.arraycopy(sorts, lo, sorts, lo + 1, size - lo)
      System.arraycopy(ties, lo, ties, lo + 1, size - lo)
      System.arraycopy(pays, lo, pays, lo + 1, size - lo)
      sorts(lo) = s; ties(lo) = t; pays(lo) = p
      size += 1
    } else {
      // full: drop slot 0 (the minimum), shift [1, lo) left, insert at
      // lo - 1 (lo >= 1 here — the entry guard rejected lo == 0)
      System.arraycopy(sorts, 1, sorts, 0, lo - 1)
      System.arraycopy(ties, 1, ties, 0, lo - 1)
      System.arraycopy(pays, 1, pays, 0, lo - 1)
      sorts(lo - 1) = s; ties(lo - 1) = t; pays(lo - 1) = p
    }
  }
}

/** Custom aggregate function (`graft_lastk(sort_val, tie_val, payload,
  * k)`): the k LARGEST (sort_val, tie_val, payload) triples per group
  * under the ascending lexicographic order, returned as an
  * `array<struct<sort_val, tie_val, payload>>` sorted ASCENDING — i.e.
  * the chronological tail of the group when sort_val/tie_val encode a
  * time order.
  *
  * Why it exists (same §4.2 escape-hatch tier as [[TopKPairs]], which
  * keeps the k smallest-rank pairs but cannot carry a payload column):
  * the sharded rolling-anomaly window needs each (type, time-bucket)
  * shard's LAST 50 rows — the carry a later shard's first frames read —
  * and every composable formulation either sorts the whole corpus under
  * a second Window (the cost the shard rework exists to remove) or
  * collects unbounded per-group state (`collect_list`). This aggregate
  * carries AT MOST k triples of longs per group at every stage: the
  * partial (map-side) aggregate already truncates to k, so the shuffle
  * moves `O(buckets × k)` longs however many rows a bucket holds. The
  * comparison includes the payload as the final tie-break, so the
  * output order is total and deterministic under any partitioning even
  * if (sort_val, tie_val) repeats.
  */
case class LastKRows(
    sortExpr: Expression,
    tieExpr: Expression,
    payExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LastKBuffer] {

  require(k > 0 && k <= 1024, s"graft_lastk: k must be in [1, 1024], got $k")

  override def children: Seq[Expression] = Seq(sortExpr, tieExpr, payExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_lastk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lastk expects (bigint, bigint, bigint, int literal), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))

  override def dataType: DataType = ArrayType(new StructType()
    .add("sort_val", LongType, nullable = false)
    .add("tie_val", LongType, nullable = false)
    .add("payload", LongType, nullable = false), containsNull = false)

  override def createAggregationBuffer(): LastKBuffer = new LastKBuffer(k)

  override def update(buf: LastKBuffer, input: InternalRow): LastKBuffer = {
    val s = sortExpr.eval(input)
    val t = tieExpr.eval(input)
    val p = payExpr.eval(input)
    // a null in any column poisons the triple's total order — reject
    // loudly instead of silently decoding 0 (the SrpBucketKeys/
    // SortedIntersectCount convention)
    if (s == null || t == null || p == null)
      throw new IllegalArgumentException(
        "graft_lastk: null input column (sort_val/tie_val/payload must be non-null)")
    buf.insert(s.asInstanceOf[Long], t.asInstanceOf[Long], p.asInstanceOf[Long])
    buf
  }

  override def merge(b1: LastKBuffer, b2: LastKBuffer): LastKBuffer = {
    var i = 0
    while (i < b2.size) { b1.insert(b2.sorts(i), b2.ties(i), b2.pays(i)); i += 1 }
    b1
  }

  override def eval(buf: LastKBuffer): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = InternalRow(buf.sorts(i), buf.ties(i), buf.pays(i)); i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: LastKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 24)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putLong(buf.sorts(i)); bb.putLong(buf.ties(i)); bb.putLong(buf.pays(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LastKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new LastKBuffer(k)
    // serialized buffers are ascending — each insert lands at the end
    var i = 0
    while (i < n) { buf.insert(bb.getLong, bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LastKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LastKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LastKRows =
    copy(sortExpr = newChildren(0), tieExpr = newChildren(1),
      payExpr = newChildren(2))
}

object LastKRows {
  /** Register `graft_lastk(sort, tie, payload, k)` (k a positive int
    * literal) in the session's function registry. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_lastk")))
      reg.createOrReplaceTempFunction("graft_lastk", exprs => {
        val k = exprs(3) match {
          case e if e.foldable => e.eval() match {
            case n: Number => n.intValue()
            case _ => throw new IllegalArgumentException(
              "graft_lastk: k must be a non-null integer literal")
          }
          case other => throw new IllegalArgumentException(
            s"graft_lastk: k must be a literal, got $other")
        }
        LastKRows(exprs(0), exprs(1), exprs(2), k)
      }, "scala_udf")
  }
}
