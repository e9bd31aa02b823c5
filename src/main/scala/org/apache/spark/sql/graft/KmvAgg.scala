package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** K-minimum-values distinct sketch as a NATIVE Catalyst aggregate —
  * tier (b) of the custom-op ladder applied to AGGREGATION (the scalar
  * expression library in expressions.scala is the same tier for
  * projections). Bar-Yossef et al. 2002; the mergeable order-statistics
  * sketch a 1000-executor tree-reduce combines by unioning partials and
  * re-trimming to k.
  *
  * Keeps the k smallest DISTINCT `(hash, id)` pairs ordered by
  * `(hash, id)` and returns the sorted hash array. Set semantics make
  * the result a pure function of the input SET — invariant under
  * partitioning, merge order, and duplicate rows — so unlike GK/HLL
  * internals the whole sketch is bit-replayable by a SQL oracle (rank
  * over distinct pairs, rn <= k). The id rides along solely to give
  * hash ties a total dedup order, mirroring the compositional
  * rendering.
  *
  * Scale contract vs the compositional rendering (distinct -> global
  * per-group rank window -> filter): state is O(k) per group, updates
  * are map-side partial aggregation, and the shuffle carries one
  * serialized sketch per (group, partition) — never the distinct value
  * set itself. That is the difference between a bounded tree-reduce
  * and a data-scale window at 100 TB.
  */
case class KmvAgg(
    hashChild: Expression,
    idChild: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
  with ImplicitCastInputTypes {

  require(k > 0 && k <= (1 << 20), s"kmv k out of range: $k")

  override def children: Seq[Expression] = Seq(hashChild, idChild)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_minhashes"

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](
      implicitly[Ordering[(Long, Long)]])

  private def insert(buf: java.util.TreeSet[(Long, Long)],
      hv: Long, id: Long): Unit = {
    // only admit entries that can enter the bottom-k; TreeSet dedups
    // identical (hv, id) pairs (set semantics = duplicate-row immunity).
    // The steady-state hot path — a full sketch rejecting a row — runs
    // on two PRIMITIVE compares against the current max, allocating
    // nothing: building a Tuple2 (plus two boxed longs) per input row
    // just to call Ordering.lt would make the one stage that touches
    // every row generate per-row garbage (the TopKBuf fast-reject
    // discipline, applied here).
    if (buf.size < k) { buf.add((hv, id)); () }
    else {
      val last = buf.last()
      if (hv < last._1 || (hv == last._1 && id < last._2)) {
        if (buf.add((hv, id)) && buf.size > k) { buf.remove(buf.last); () }
      }
    }
  }

  override def update(buf: java.util.TreeSet[(Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val h = hashChild.eval(input)
    val i = idChild.eval(input)
    if (h != null && i != null)
      insert(buf, h.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[(Long, Long)],
      other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) {
      val (h, i) = it.next()
      insert(buf, h, i)
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next()._1; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
    val it = buf.iterator()
    while (it.hasNext) {
      val (h, i) = it.next()
      bb.putLong(h); bb.putLong(i)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) buf.add((bb.getLong(), bb.getLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(hashChild = newChildren(0), idChild = newChildren(1))
}

object KmvAgg {
  /** Column API: sorted array of the k smallest distinct (hash, id)
    * pairs' hashes within the group.
    */
  def kmvMinhashes(hash: Column, id: Column, k: Int): Column =
    Bridge.column(
      KmvAgg(Bridge.expression(hash), Bridge.expression(id), k)
        .toAggregateExpression())
}
