package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: parallel primitive arrays in rank order
  * (value DESC, id ASC), set semantics on (value, id). The hot path —
  * a row that cannot enter the top-k — is two primitive compares and
  * ZERO allocation; admission is a binary search + arraycopy shift.
  */
final class TopKBuf(val k: Int) {
  var vs: Array[Double] = new Array[Double](math.min(k, 16))
  var ids: Array[Long] = new Array[Long](math.min(k, 16))
  var size: Int = 0

  /** rank compare: negative when (v1,i1) ranks strictly before (v2,i2). */
  @inline private def cmp(v1: Double, i1: Long, v2: Double, i2: Long): Int = {
    val c = java.lang.Double.compare(v2, v1)
    if (c != 0) c else java.lang.Long.compare(i1, i2)
  }

  def insert(v0: Double, id: Long): Unit = {
    if (v0 != v0) return // NaN would poison the ordering invariant
    // normalize -0.0: Double.compare ranks 0.0 above -0.0, but the
    // row_number oracle (and Spark/DuckDB comparisons) treat them as a
    // value TIE broken by id — fold both to +0.0 so they are
    val v = if (v0 == 0.0) 0.0 else v0
    if (size == k &&
      cmp(v, id, vs(size - 1), ids(size - 1)) >= 0) return // fast reject
    // binary search for the rank position
    var lo = 0; var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(vs(mid), ids(mid), v, id) <= 0) lo = mid + 1 else hi = mid
    }
    // set semantics: identical (value, id) pairs collapse
    if (lo > 0 && vs(lo - 1) == v && ids(lo - 1) == id) return
    if (size == vs.length && size < k) { // grow
      val n = math.min(k, vs.length * 2)
      vs = java.util.Arrays.copyOf(vs, n)
      ids = java.util.Arrays.copyOf(ids, n)
    }
    val newSize = math.min(size + 1, k)
    val shift = newSize - lo - 1
    if (shift > 0) {
      System.arraycopy(vs, lo, vs, lo + 1, shift)
      System.arraycopy(ids, lo, ids, lo + 1, shift)
    }
    vs(lo) = v; ids(lo) = id
    size = newSize
  }
}

/** Per-group top-k as a NATIVE Catalyst aggregate — the KmvAgg sibling
  * for order statistics (same tier-(b) custom-op ladder rung).
  *
  * Keeps the k largest `(value, id)` pairs per group, ordered by
  * `(value DESC, id ASC)` — the id is the deterministic tie-break, so
  * the result is a pure function of the input SET (invariant under
  * partitioning, merge order, and duplicate rows), which makes the
  * whole ranking bit-replayable by a `row_number()` SQL oracle.
  *
  * Scale contract vs the window rendering
  * (`row_number().over(partitionBy(g).orderBy(v.desc)) <= k`): the
  * window must shuffle every fact row onto its group's partition and
  * SORT there — with a LOW-cardinality group column that is a handful
  * of partitions sorting the whole fact no matter how many executors
  * exist. This aggregate keeps O(k) state per group, does map-side
  * partial top-k, and the shuffle carries one k-entry buffer per
  * (group, partition): a bounded tree-reduce. Regime guidance
  * (TopKProbe measures both at 100x): LOW-cardinality groups — use
  * this aggregate (0.32 s vs the window's 1.40 s locally, and the
  * window's 15-partition sort is structurally unscalable);
  * HIGH-cardinality groups (~one per customer) — prefer the window:
  * with only a few rows per group per map partition, partial
  * aggregation cannot combine, so this aggregate pays one object
  * buffer + serde per group while the window's per-partition radix
  * sort wins (1.97 s vs 8.1 s at 100x local). Two caveats a deployment
  * must know: ObjectHashAggregate falls back to sort-based aggregation
  * past spark.sql.objectHashAggregate.sortBased.fallbackThreshold
  * (default 128) distinct keys per partition — raise it for wide group
  * spaces — and NaN values are rejected on entry; nulls in either
  * child are skipped like every SQL aggregate.
  */
case class TopKAgg(
    valueChild: Expression,
    idChild: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf]
  with ImplicitCastInputTypes {

  require(k > 0 && k <= TopKAgg.MaxK, s"topk k out of range: $k")

  override def children: Seq[Expression] = Seq(valueChild, idChild)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_entries"

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val v = valueChild.eval(input)
    val i = idChild.eval(input)
    if (v != null && i != null)
      buf.insert(v.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    var i = 0
    while (i < other.size) {
      buf.insert(other.vs(i), other.ids(i))
      i += 1
    }
    buf
  }

  override def eval(buf: TopKBuf): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      out(i) = InternalRow(buf.vs(i), buf.ids(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.vs(i)); bb.putLong(buf.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) buf.insert(bb.getDouble(), bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(valueChild = newChildren(0), idChild = newChildren(1))
}

object TopKAgg {
  /** Largest k the bounded-heap aggregate accepts: past ~1M entries per
    * group the buffer is no longer "bounded" in any useful sense and a
    * window/sort is the honest plan — dispatch callers flip rendering on
    * this constant instead of hardcoding it.
    */
  val MaxK: Int = 1 << 20

  /** Column API: array of the k largest (value, id) structs within the
    * group, ordered (value DESC, id ASC).
    */
  def topkEntries(value: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKAgg(Bridge.expression(value), Bridge.expression(id), k)
        .toAggregateExpression())
}
