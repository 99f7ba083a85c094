package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter kernels. Reference semantics:
  * lantern_extras/src/bloom.rs:46-103 — `array_to_bloom` sizes for a
  * false-positive rate of 0.01 with a fixed seed (42), `elem_in_bloom`
  * probes membership. The value is a struct (bitmap: binary,
  * num_hashes: int), the Spark shape of the reference's `bloom` varlena
  * {bitmap, num_hashes}.
  *
  * Hashing is double-hashing (Kirsch-Mitzenmacher): bit_i =
  * (h1 + i*h2) mod m with two splitmix64-derived hashes — original
  * implementation, deterministic across engines and runs.
  */
object BloomKernels {
  val Fp = 0.01
  val Seed = 42L

  private val Ln2 = math.log(2.0)

  /** Bits for the fp target, rounded UP to a whole byte: probes derive
    * m from the bitmap length, so build and probe must agree on it. */
  def numBits(n: Int): Int = {
    val raw = math.max(8, math.ceil(-n * math.log(Fp) / (Ln2 * Ln2)).toInt)
    (raw + 7) / 8 * 8
  }

  def numHashes(m: Int, n: Int): Int =
    math.max(1, math.round(Ln2 * m / math.max(n, 1)).toInt)

  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  @inline def hashLong(x: Long): (Long, Long) =
    (mix64(x ^ Seed), mix64(x ^ 0x5851f42d4c957f2dL) | 1L)

  def hashString(s: UTF8String): (Long, Long) = {
    // FNV-1a 64 over the bytes, then the same finalizers as longs
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L
      i += 1
    }
    hashLong(h)
  }

  @inline private def setBit(bm: Array[Byte], bit: Int): Unit =
    bm(bit >>> 3) = (bm(bit >>> 3) | (1 << (bit & 7))).toByte

  @inline private def getBit(bm: Array[Byte], bit: Int): Boolean =
    (bm(bit >>> 3) & (1 << (bit & 7))) != 0

  private def buildFrom(n: Int, hashes: Int => (Long, Long)): InternalRow = {
    val m = numBits(n)
    val k = numHashes(m, n)
    val bm = new Array[Byte]((m + 7) / 8)
    var i = 0
    while (i < n) {
      val (h1, h2) = hashes(i)
      var j = 0
      while (j < k) {
        setBit(bm, java.lang.Long.remainderUnsigned(h1 + j * h2, m).toInt)
        j += 1
      }
      i += 1
    }
    InternalRow(bm, k)
  }

  def buildLongs(arr: ArrayData): InternalRow =
    buildFrom(arr.numElements(), i => hashLong(arr.getLong(i)))

  def buildStrings(arr: ArrayData): InternalRow =
    buildFrom(arr.numElements(), i => hashString(arr.getUTF8String(i)))

  private def contains(bloom: InternalRow, h1: Long, h2: Long): Boolean = {
    val bm = bloom.getBinary(0)
    val k = bloom.getInt(1)
    val m = bm.length * 8
    var j = 0
    while (j < k) {
      if (!getBit(bm, java.lang.Long.remainderUnsigned(h1 + j * h2, m).toInt))
        return false
      j += 1
    }
    true
  }

  def containsLong(x: Long, bloom: InternalRow): Boolean = {
    val (h1, h2) = hashLong(x); contains(bloom, h1, h2)
  }

  def containsString(x: UTF8String, bloom: InternalRow): Boolean = {
    val (h1, h2) = hashString(x); contains(bloom, h1, h2)
  }
}

object BloomType {
  val sqlType: StructType = StructType(Seq(
    StructField("bitmap", BinaryType, nullable = false),
    StructField("num_hashes", IntegerType, nullable = false)))
}

/** `array_to_bloom(bigint[]) -> bloom` (reference bloom.rs:46-74; the
  * smallint[]/integer[] casts of bloom.rs:76-91 are int-widening casts
  * applied by the column wrapper). */
case class BloomBuild(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = BloomType.sqlType
  override def prettyName: String = "array_to_bloom"
  override def nullSafeEval(v: Any): Any =
    BloomKernels.buildLongs(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.BloomKernels.buildLongs($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `array_to_bloom(text[]) -> bloom`. */
case class BloomBuildText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = BloomType.sqlType
  override def prettyName: String = "array_to_bloom"
  override def nullSafeEval(v: Any): Any =
    BloomKernels.buildStrings(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.BloomKernels.buildStrings($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `elem_in_bloom(elem bigint, bloom) -> bool` (bloom.rs:93-103). */
case class ElemInBloom(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, BloomType.sqlType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "elem_in_bloom"
  override def nullSafeEval(x: Any, b: Any): Any =
    BloomKernels.containsLong(x.asInstanceOf[Long], b.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, b) =>
      s"org.apache.spark.sql.graft.BloomKernels.containsLong($x, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `elem_in_bloom(elem text, bloom) -> bool`. */
case class ElemInBloomText(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, BloomType.sqlType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "elem_in_bloom"
  override def nullSafeEval(x: Any, b: Any): Any =
    BloomKernels.containsString(x.asInstanceOf[UTF8String],
      b.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, b) =>
      s"org.apache.spark.sql.graft.BloomKernels.containsString($x, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
