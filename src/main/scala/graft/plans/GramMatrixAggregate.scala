package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Upper-triangular gram (scatter) matrix aggregate over integer-quantized
  * vectors: `gram(codes, d)` sums `qᵢ·qⱼ` for every `i ≤ j` across the
  * group's code arrays and evaluates to `array<struct<i, j, q_sum>>` of the
  * d·(d+1)/2 triangle entries.
  *
  * This is stage 1 of distributed PCA / covariance estimation (the classic
  * split: the O(n·d²) scatter accumulation runs where the data lives, the
  * O(d³) eigendecomposition runs on the d×d result — see e.g. MLlib's
  * RowMatrix.computeGramianMatrix for the same architecture). Why a custom
  * aggregate rather than explode+groupBy: exploding emits d·(d+1)/2 rows per
  * vector (2 080 at d=64) before the map-side combine can see them; this
  * buffer does the combine in place — each partition ships ONE flat long
  * array regardless of row count, so the shuffle is |partitions|·d²/2 longs,
  * independent of corpus size.
  *
  * All arithmetic is 64-bit integer: sums are exact and identical under any
  * partitioning or accumulation order, which is what makes the result
  * oracle-checkable bit-for-bit (and overflow-safe by construction for any
  * corpus this engine targets: |q| ≤ 2¹² ⇒ each term ≤ 2²⁴, leaving room
  * for ~2³⁹ ≈ 5·10¹¹ vectors before a Long could wrap).
  */
case class GramMatrixAggregate(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim > 0, s"gram dim must be positive, got $dim")
  private val triLen = dim * (dim + 1) / 2

  override def prettyName: String = "gram_matrix"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", LongType, nullable = false),
      StructField("j", LongType, nullable = false),
      StructField("q_sum", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](triLen)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (arr.numElements() != dim)
        throw new IllegalArgumentException(
          s"gram_matrix(dim=$dim) fed a ${arr.numElements()}-element vector")
      val q = arr.toLongArray()
      var i = 0
      var p = 0
      while (i < dim) {
        val qi = q(i)
        var j = i
        while (j < dim) { b(p) += qi * q(j); j += 1; p += 1 }
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] = {
    var p = 0
    while (p < triLen) { b(p) += other(p); p += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = {
    val out = new Array[Any](triLen)
    var i = 0
    var p = 0
    while (i < dim) {
      var j = i
      while (j < dim) { out(p) = InternalRow(i.toLong, j.toLong, b(p)); j += 1; p += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * triLen)
    var p = 0
    while (p < triLen) { bb.putLong(b(p)); p += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val b  = new Array[Long](triLen)
    var p = 0
    while (p < triLen) { b(p) = bb.getLong; p += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): GramMatrixAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramMatrixAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object GramMatrixAggregate {

  /** Column API: `gram(codes, d)` → `array<struct<i,j,q_sum>>` (upper
    * triangle, row-major). `codes` must be `array<long>` of length `d`. */
  def gram(codes: Column, dim: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(GramMatrixAggregate(bridge.expression(codes), dim)
      .toAggregateExpression())
  }
}
