package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter build + probe for shuffle-avoiding semi joins.
  *
  * Why: a semi join against a build side too big to broadcast as a hash
  * relation shuffles the ENTIRE probe side on the join key. A Bloom filter
  * of the build keys is 100–1000× smaller than the keys themselves (m bits
  * for n keys at fpp ≈ (1−e^(−kn/m))^k), small enough to broadcast when the
  * key set is not, so the probe side drops non-matching rows map-side —
  * before the exchange — and only ~fpp extra rows reach the exact join.
  * This is the runtime-filter pattern (Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` applies it opportunistically);
  * the engine exposes it as a deterministic, explicitly-sized operator —
  * see [[graft.operators.BloomJoin]] for the end-to-end shape.
  *
  * Determinism contract: the filter's bit pattern is a pure function of the
  * inserted key SET (bit-OR is commutative/associative/idempotent), so the
  * probe's verdict is independent of partitioning, merge order, and
  * duplicate keys — safe for retries and oracle checks. No false negatives
  * ever; false positives are removed by the exact join that follows.
  *
  * Hashing is double hashing (Kirsch–Mitzenmacher 2006: two 64-bit hashes
  * simulate k independent ones with no asymptotic fpp loss) over a
  * splitmix64 finalizer of the caller-supplied 64-bit key.
  */
object BloomFilter {

  /** Bit positions and probe logic shared verbatim by the build aggregate,
    * the interpreted probe, and the generated probe code (the generated
    * code calls these through the object's static forwarders). */
  // splitmix64 finalizer (Steele et al., public domain PRNG mixing step):
  // full-avalanche 64->64 mix, so biased input keys (sequential ids,
  // xxhash64 outputs) still index bits uniformly.
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  def readLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  /** Probe: true iff every one of the k double-hashed bits is set.
    * `bloom` layout: int numHashes, then the bit words big-endian. */
  def mightContain(bloom: Array[Byte], key: Long): Boolean = {
    val k = readInt(bloom, 0)
    val numBits = ((bloom.length - 4) >> 3).toLong << 6 // words * 64, power of 2
    val mask = numBits - 1
    val h1 = mix(key)
    val h2 = mix(key + 0x9e3779b97f4a7c15L) | 1L // odd stride
    var i = 0
    while (i < k) {
      val bit = (h1 + i * h2) & mask
      val word = readLong(bloom, 4 + ((bit >>> 6).toInt << 3))
      if ((word & (1L << (bit & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** Build-side bit set: same addressing as [[mightContain]]. */
  def setBits(words: Array[Long], key: Long, numHashes: Int): Unit = {
    val numBits = words.length.toLong << 6
    val mask = numBits - 1
    val h1 = mix(key)
    val h2 = mix(key + 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = (h1 + i * h2) & mask
      words((bit >>> 6).toInt) |= (1L << (bit & 63L).toInt)
      i += 1
    }
  }

  /** `bloom_build(keyHash, numBits, numHashes)` → binary. `key` must be a
    * 64-bit hash of the join key (e.g. `xxhash64(col)` — hashing the key to
    * a fixed-width long keeps the aggregate type-uniform over any key type). */
  def build(key: Column, numBits: Int = 1 << 22, numHashes: Int = 5): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(BloomBuildAggregate(bridge.expression(key), numBits, numHashes)
      .toAggregateExpression())
  }

  /** `bloom_might_contain(bloom, keyHash)` → boolean; no false negatives. */
  def mightContainCol(bloom: Column, key: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(BloomMightContain(bridge.expression(bloom), bridge.expression(key)))
  }
}

/** Bloom bit-set aggregate. Buffer is the raw word array; partial buffers
  * ship as bytes and merge by OR, so map-side partial aggregation sends one
  * m-bit filter per partition instead of the key stream.
  *
  * numBits must be a power of two (bit addressing is a mask, and the probe
  * reconstructs the modulus from the byte length alone).
  */
case class BloomBuildAggregate(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  // keys are 64-bit hashes (xxhash64/md5h48) by contract; checking the
  // input type turns a wrong-typed SQL argument into an analysis error
  // instead of a runtime ClassCastException
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_build requires a BIGINT key (hash the value first), got ${child.dataType.sql}")

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16, s"numHashes in [1,16], got $numHashes")

  override def prettyName: String = "bloom_build"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits >>> 6)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilter.setBits(b, v.asInstanceOf[Long], numHashes)
    b
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) |= other(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = {
    val out = new Array[Byte](4 + b.length * 8)
    out(0) = (numHashes >>> 24).toByte
    out(1) = (numHashes >>> 16).toByte
    out(2) = (numHashes >>> 8).toByte
    out(3) = numHashes.toByte
    var i = 0
    while (i < b.length) {
      val w = b(i)
      val off = 4 + i * 8
      var j = 0
      while (j < 8) { out(off + j) = (w >>> (56 - 8 * j)).toByte; j += 1 }
      i += 1
    }
    out
  }

  override def serialize(b: Array[Long]): Array[Byte] = eval(b).asInstanceOf[Array[Byte]]

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val words = new Array[Long]((bytes.length - 4) >>> 3)
    var i = 0
    while (i < words.length) { words(i) = BloomFilter.readLong(bytes, 4 + i * 8); i += 1 }
    words
  }

  override def withNewMutableAggBufferOffset(offset: Int): BloomBuildAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomBuildAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Probe expression: stays inside whole-stage codegen (the generated code
  * is one static call on (byte[], long) — no boxing, no ByteBuffer per
  * row), so a bloom pre-filter sits in the scan stage like any comparison. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires (BINARY filter, BIGINT key), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(bloom: Any, key: Any): Any =
    BloomFilter.mightContain(bloom.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, k) =>
      s"${ev.value} = graft.plans.BloomFilter.mightContain($b, $k);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
