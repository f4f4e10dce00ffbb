package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlAccess
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded bottom-k-distinct aggregate: the k smallest DISTINCT long
  * values of `child`, returned sorted ascending.
  *
  * This is the mergeable primitive behind two scale-critical idioms
  * (`operators/Sketches.scala`):
  *
  *  - the KMV (k-minimum-values) distinct sketch: over uniform 60-bit
  *    hashes, distinct ≈ (k-1)·2^60 / h_(k) — a fixed-size, mergeable
  *    distinct estimator whose CONTENT (unlike HLL registers) is a
  *    pure function of the value set, so any engine with the same
  *    hash replays it bit-for-bit (exact cross-engine oracle);
  *  - deterministic bottom-k-per-group sampling: the k-th smallest
  *    hash is a per-group selection threshold, computed WITHOUT
  *    sorting or shuffling the group's rows.
  *
  * Scale design: state is a ≤ k-entry sorted set (k·8 bytes), update
  * is O(log k), merge is O(k log k), and the aggregate participates in
  * partial aggregation — the plan is one map-side-combined hash
  * aggregate shuffling at most k longs per group, vs a full shuffle +
  * sort for the window-function equivalent. Nulls are ignored (SQL
  * aggregate convention); a group with no non-null input returns an
  * empty array, never null.
  */
case class BottomKDistinct(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottom_k_distinct expects a bigint child and k >= 1, got " +
        s"${child.dataType.catalogString}, k=$k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val l = v.asInstanceOf[Long]
      // admit only values that can enter the bottom k: skip the add
      // entirely when the set is full and l is not below the current max
      if (buf.size < k) buf.add(l)
      else if (l < buf.last) { buf.add(l); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      val l = it.next()
      if (a.size < k) a.add(l)
      else if (l < a.last) { a.add(l); if (a.size > k) a.pollLast() }
    }
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKDistinct =
    copy(child = newChild)
  override def prettyName: String = "bottom_k_distinct"
}

object BottomK {
  /** Column form: `bottom_k_distinct(longCol, k)` → `array<bigint>` of
    * the k smallest distinct values, sorted ascending. */
  def bottom_k_distinct(c: Column, k: Int): Column =
    GraftSqlAccess.column(
      BottomKDistinct(GraftSqlAccess.expression(c), k).toAggregateExpression())
}
