package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Heap-based top-k aggregate: `topk((score, id), k)` keeps the k largest
  * (score, id) pairs per group — scores descending, ids ascending on ties.
  *
  * Why a custom aggregate: the composable top-k-per-group
  * (`row_number().over(partitionBy(g).orderBy(score))` + filter) SORTS every
  * group's full candidate list — O(n log n) per group plus a full shuffle of
  * all candidates. This aggregate keeps an O(k) bounded heap, runs map-side
  * partial aggregation (each partition ships at most k pairs per group), and
  * merges heaps — O(n log k) total and a shuffle of k·|groups| rows. For
  * similarity search with n = corpus size per query, that is the difference
  * between shuffling the corpus and shuffling the answer.
  *
  * TypedImperativeAggregate (not DeclarativeAggregate) because the buffer is
  * a variable-size structure; the buffer serializes as little-endian
  * (count, (score, id)*) for shuffle transport.
  */
case class TopKAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAggregate.Buffer] {
  import TopKAggregate.Buffer

  override def prettyName: String = "topk"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(b: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      b.offer(row.getDouble(0), row.getLong(1))
    }
    b
  }

  override def merge(b: Buffer, other: Buffer): Buffer = { b.absorb(other); b }

  override def eval(b: Buffer): Any = {
    val sorted = b.sortedPairs // score desc, id asc
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(b: Buffer): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): Buffer = Buffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(offset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object TopKAggregate {

  /** Bounded min-heap of (score, id); the root is the WORST kept pair so a
    * better candidate replaces it in O(log k). Tie rule: on equal scores the
    * larger id is worse (we keep ascending ids), making results total-order
    * deterministic. */
  final class Buffer(k: Int) {
    private val scores = new Array[Double](k)
    private val ids    = new Array[Long](k)
    private var n      = 0

    private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 < s2 || (s1 == s2 && i1 > i2) // (s1,i1) worse than (s2,i2)

    private def siftUp(pos0: Int): Unit = {
      var pos = pos0
      while (pos > 0) {
        val parent = (pos - 1) / 2
        if (worse(scores(pos), ids(pos), scores(parent), ids(parent))) {
          swap(pos, parent); pos = parent
        } else return
      }
    }

    private def siftDown(): Unit = {
      var pos = 0
      while (true) {
        val l = 2 * pos + 1; val r = l + 1
        var worst = pos
        if (l < n && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
        if (r < n && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
        if (worst == pos) return
        swap(pos, worst); pos = worst
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    def offer(s: Double, id: Long): Unit =
      if (n < k) {
        scores(n) = s; ids(n) = id; n += 1; siftUp(n - 1)
      } else if (worse(scores(0), ids(0), s, id)) {
        scores(0) = s; ids(0) = id; siftDown()
      }

    def absorb(other: Buffer): Unit = {
      var i = 0
      while (i < other.n) { offer(other.scores(i), other.ids(i)); i += 1 }
    }

    def sortedPairs: Array[(Double, Long)] = {
      val out = Array.tabulate(n)(i => (scores(i), ids(i)))
      out.sortWith { case ((s1, i1), (s2, i2)) => s1 > s2 || (s1 == s2 && i1 < i2) }
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + n * 16)
      bb.putInt(n)
      var i = 0
      while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
      bb.array()
    }
  }

  object Buffer {
    def fromBytes(k: Int, bytes: Array[Byte]): Buffer = {
      val bb = ByteBuffer.wrap(bytes)
      val m  = bb.getInt
      val b  = new Buffer(k)
      var i  = 0
      while (i < m) { b.offer(bb.getDouble, bb.getLong); i += 1 }
      b
    }
  }

  /** Column API: topk(struct(score, id), k) → array<struct<score,id>>. */
  def topk(scoreAndId: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(TopKAggregate(bridge.expression(scoreAndId), k)
      .toAggregateExpression())
  }
}
