package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Misra–Gries frequent-items sketch over long keys: `capacity` counters
  * guarantee that EVERY key with true frequency > n/(capacity+1) is in the
  * summary (Misra & Gries '82), with merge by counter addition + offset
  * subtraction (the mergeable-summaries rule, Agarwal et al. '12 — the
  * error bounds add, so the guarantee survives arbitrary partitioning).
  *
  * Why a sketch: an exact heavy-key census shuffles every distinct key; at
  * 100 TB a "which keys exceed 1/128 of traffic" gate should not pay a
  * full-cardinality exchange. This aggregate ships ≤ `capacity` counters
  * per partition (map-side combine), and the tiny candidate SUPERSET it
  * returns is then exact-verified with one broadcast join — identical
  * final answer to the exact GROUP BY ... HAVING, like the Bloom and LSH
  * operators, the candidate stage is invisible in the result
  * ([[graft.operators.HeavyHitters]] wires the two stages).
  *
  * The candidate SET may vary with merge order (any MG summary does); the
  * guarantee — no false dismissals above the threshold — holds for every
  * order, which is all the verified final answer needs.
  */
case class FrequentItemsAggregate(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  // tracked items are longs by contract (ids or 64-bit hashes); a
  // wrong-typed SQL argument fails analysis, not at runtime
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_frequent requires a BIGINT item (ids or 64-bit hashes), got ${child.dataType.sql}")

  require(capacity >= 1 && capacity <= 100000, s"capacity in [1, 1e5], got $capacity")

  override def prettyName: String = "mg_frequent"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.LongMap[Long] = mutable.LongMap.empty

  override def update(b: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      b.get(k) match {
        case Some(c) => b.update(k, c + 1)
        case None if b.size < capacity => b.update(k, 1L)
        case None => // decrement-all: drop one occurrence of every tracked key
          val dead = mutable.ArrayBuffer.empty[Long]
          b.foreachEntry { (key, c) => if (c == 1L) dead += key else b.update(key, c - 1) }
          dead.foreach(b.remove)
      }
    }
    b
  }

  override def merge(b: mutable.LongMap[Long], other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreachEntry { (k, c) => b.update(k, b.getOrElse(k, 0L) + c) }
    if (b.size > capacity) {
      // subtract the (capacity+1)-th largest count from every counter:
      // ≤ capacity keys stay strictly positive, error bounds add
      val counts = b.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (capacity + 1))
      val dead = mutable.ArrayBuffer.empty[Long]
      b.foreachEntry { (k, c) => if (c - d <= 0L) dead += k else b.update(k, c - d) }
      dead.foreach(b.remove)
    }
    b
  }

  override def eval(b: mutable.LongMap[Long]): Any = {
    val keys = b.keys.toArray
    java.util.Arrays.sort(keys) // stable rendering of the candidate set
    new GenericArrayData(keys)
  }

  override def serialize(b: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.size * 16)
    bb.putInt(b.size)
    b.foreachEntry { (k, c) => bb.putLong(k); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { b.update(bb.getLong, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): FrequentItemsAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FrequentItemsAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object FrequentItemsAggregate {
  /** Column API: candidate heavy keys (array<long> superset of every key
    * with frequency > n/(capacity+1)). */
  def candidates(key: Column, capacity: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(FrequentItemsAggregate(bridge.expression(key), capacity)
      .toAggregateExpression())
  }
}
