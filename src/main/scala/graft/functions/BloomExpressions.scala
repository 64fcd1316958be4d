package org.apache.spark.sql.graftfn

// Lives under org.apache.spark.sql for the same reason as
// VectorExpressions: the private[sql] Column↔Expression bridge
// (classic.ExpressionUtils). Engine-facing API is re-exported via
// graft.ext.Dedup (benchmarkOverlapBloom).

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType}

/** Split-off probe kernel so the interpreted path and the generated code
  * run the SAME bytes — codegen calls the static forwarder instead of
  * re-implementing the loop (the JIT inlines it; what matters for the
  * hot path is staying inside whole-stage codegen with primitive args,
  * no boxing, no virtual dispatch).
  *
  * Double hashing (Kirsch–Mitzenmacher 2006, public result): position i
  * is (h1 + i*h2) masked to the power-of-two bit count; h2 is forced odd
  * so the stride cycles the whole table.
  */
object BloomKernel {
  @inline def h2of(h1: Long): Long =
    (java.lang.Long.rotateLeft(h1, 31) * 0xff51afd7ed558ccdL) | 1L

  /** `bits.length` MUST be a power of two (Bloom.build guarantees it). */
  def mightContain(bits: Array[Long], numHashes: Int, h1: Long): Boolean = {
    val mask = bits.length.toLong * 64L - 1L
    val h2 = h2of(h1)
    var i = 0
    while (i < numHashes) {
      val pos = (h1 + i.toLong * h2) & mask
      if ((bits((pos >>> 6).toInt) & (1L << pos)) == 0L) return false
      i += 1
    }
    true
  }

  def set(bits: Array[Long], numHashes: Int, h1: Long): Unit = {
    val mask = bits.length.toLong * 64L - 1L
    val h2 = h2of(h1)
    var i = 0
    while (i < numHashes) {
      val pos = (h1 + i.toLong * h2) & mask
      bits((pos >>> 6).toInt) |= (1L << pos)
      i += 1
    }
  }
}

/** Immutable built filter: the broadcastable artifact. At 16 bits/key a
  * 100M-gram benchmark set costs ~200 MB — shippable to every executor —
  * where the exact string set would be many GB and force a shuffle join
  * on the full corpus posting table.
  */
final case class BloomBits(bits: Array[Long], numHashes: Int) {
  def mightContain(h: Long): Boolean = BloomKernel.mightContain(bits, numHashes, h)
}

object Bloom {
  /** Deterministic filter geometry for n keys: the bit count rounds
    * n*bitsPerKey up to a power of two (mask-only addressing); numHashes
    * follows the optimum k = ln2 · m/n for the ROUNDED m, clamped to
    * [1, 24]. Shared by the driver-side and distributed builds so both
    * produce bit-identical filters for the same key set.
    */
  def layout(n0: Long, bitsPerKey: Int): (Long, Int) = {
    require(bitsPerKey >= 1, s"bloom: bitsPerKey $bitsPerKey < 1")
    val n = math.max(1L, n0)
    var mBits = 64L
    while (mBits < n * bitsPerKey) mBits <<= 1
    val k = math.max(1, math.min(24, math.round(0.6931 * mBits / n).toInt))
    (mBits, k)
  }

  /** Driver-side build from 64-bit element hashes (small key sets). */
  def build(hashes: Array[Long], bitsPerKey: Int = 16): BloomBits = {
    val (mBits, k) = layout(hashes.length.toLong, bitsPerKey)
    val bits = new Array[Long]((mBits >>> 6).toInt)
    var i = 0
    while (i < hashes.length) { BloomKernel.set(bits, k, hashes(i)); i += 1 }
    BloomBits(bits, k)
  }

  /** Distributed build: each partition sets bits into its own local
    * bitset with the SAME kernel, and the bitsets OR-merge up a
    * `treeAggregate` — the driver receives O(tree fan-in) m-bit arrays,
    * never the element hashes themselves (at 100M bench grams that's the
    * difference between ~200 MB of filter and an 800 MB driver collect
    * of raw hashes). `n` sizes the filter and is a cheap count upstream;
    * OR is commutative/associative/idempotent, so partitioning and merge
    * order cannot change the result — build ≡ driver build on the same
    * key set (asserted in BloomSpec).
    */
  def buildDistributed(
      hashes: org.apache.spark.rdd.RDD[Long],
      n: Long,
      bitsPerKey: Int = 16): BloomBits = {
    val (mBits, k) = layout(n, bitsPerKey)
    val words = (mBits >>> 6).toInt
    val bits = hashes.treeAggregate(new Array[Long](words))(
      (acc, h) => { BloomKernel.set(acc, k, h); acc },
      (a, b) => { var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a })
    BloomBits(bits, k)
  }
}

/** `graft_bloom_contains(hash64)` — membership probe against a bloom
  * filter carried by the expression itself (the plan ships it to
  * executors once per task-set, like Spark's own BloomFilterMightContain
  * runtime filter). Codegen'd: the probe stays inside whole-stage
  * codegen as a static call on primitive longs.
  */
case class BloomMightContain(child: Expression, bloom: BloomBits)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(h: Any): Any =
    BloomKernel.mightContain(bloom.bits, bloom.numHashes, h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bloom.bits, "long[]")
    val k = bloom.numHashes
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = org.apache.spark.sql.graftfn.BloomKernel.mightContain($bitsRef, $k, $h);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  /** `Column` wrapper: true iff the 64-bit hash column may be in `bloom`. */
  def mightContain(hash64: Column, bloom: BloomBits): Column =
    ExpressionUtils.column(BloomMightContain(ExpressionUtils.expression(hash64), bloom))
}
