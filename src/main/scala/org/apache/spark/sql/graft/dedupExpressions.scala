package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels invoked from codegen (must be stable public methods). */
object DedupKernels {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Single-pass 64-bit SimHash over a shingle array. Bit semantics are
    * identical to the SQL formulation the DuckDB oracle replays: bit p
    * (1-based) votes +1 when the p-th hex digit of
    * md5(g) || md5('#' || g) is >= 8, else -1; the bit is '1' iff the
    * total is > 0. A hex digit is >= 8 exactly when the nibble's high
    * bit is set, so the vote reads straight off the digest bytes — no
    * hex string is ever materialized, and each shingle is hashed twice
    * total (vs 64 substring+conv passes over a concatenated hex string
    * in the expression-tree form this kernel replaced). */
  def simhash64(sh: ArrayData): UTF8String = {
    val votes = new Array[Int](64)
    val md = mdLocal.get()
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      if (sh.isNullAt(i)) {
        // SQL-form parity: a null element's md5 is null, the >= 8 test
        // is null, and the CASE falls to the ELSE branch — every one of
        // the 64 positions votes -1 (never an NPE)
        var p = 0
        while (p < 64) { votes(p) -= 1; p += 1 }
      } else {
        val g = sh.getUTF8String(i).getBytes
        val d1 = md.digest(g) // digest() resets the instance
        md.update('#'.toByte)
        val d2 = md.digest(g)
        var j = 0
        while (j < 16) {
          // hex digit 2j+1 = high nibble of byte j, digit 2j+2 = low nibble
          val b1 = d1(j)
          votes(2 * j) += (if ((b1 & 0x80) != 0) 1 else -1)
          votes(2 * j + 1) += (if ((b1 & 0x08) != 0) 1 else -1)
          val b2 = d2(j)
          votes(32 + 2 * j) += (if ((b2 & 0x80) != 0) 1 else -1)
          votes(32 + 2 * j + 1) += (if ((b2 & 0x08) != 0) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](64)
    var p = 0
    while (p < 64) {
      out(p) = if (votes(p) > 0) '1'.toByte else '0'.toByte
      p += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Packed sign bits of dot(vec, plane_p) over P <= 64 flattened
    * planes: bit p is set iff the double-accumulated dot with plane p
    * is >= 0 — accumulation order and the >= 0 threshold are identical
    * to the per-plane `InnerProduct >= 0` expression tree this kernel
    * replaced, so signatures match it bit-for-bit. Throws on dimension
    * mismatch (caller error), like the distance kernels. */
  def hyperplaneSig(vec: ArrayData, planes: Array[Float], dim: Int): Long = {
    val n = vec.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"hyperplane_sig: expected $dim-dim vector, got $n")
    val p = planes.length / dim
    var sig = 0L
    var i = 0
    while (i < p) {
      var acc = 0.0
      val base = i * dim
      var j = 0
      while (j < dim) {
        acc += vec.getFloat(j).toDouble * planes(base + j).toDouble
        j += 1
      }
      if (acc >= 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Differing byte positions between equal-length ASCII strings
    * (codegen kernel for [[BitHamming]]; throws unchecked on length
    * mismatch — a mixed-width signature column is caller error). */
  def bitHamming(a: UTF8String, b: UTF8String): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    if (ab.length != bb.length)
      throw new IllegalArgumentException(
        s"bit_hamming: unequal lengths ${ab.length} vs ${bb.length}")
    var i = 0
    var c = 0
    while (i < ab.length) {
      if (ab(i) != bb(i)) c += 1
      i += 1
    }
    c
  }
}

/** `bit_hamming(a, b)`: number of differing character positions between
  * two equal-length ASCII strings — the verification kernel for
  * bit-string signatures ([[Simhash64]] output). One byte-compare loop,
  * no array materialization: the SQL formulation
  * (`aggregate(zip_with(split(a,''), split(b,''), ...))`) builds two
  * 64-element string arrays and evaluates three lambdas per position
  * PER CANDIDATE PAIR — and Catalyst pushes post-join filters into the
  * join as residual conditions, so that cost lands on every
  * bucket-matched pair, not just the distinct survivors. */
case class BitHamming(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bit_hamming"

  override def nullSafeEval(a: Any, b: Any): Any =
    DedupKernels.bitHamming(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.DedupKernels.bitHamming($a, $b)")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** `simhash64(shingles)`: 64-bit SimHash signature of a document's
  * shingle array as a 64-char bit string — the single-pass codegen
  * kernel behind [[graft.dedup.Dedup.simhash64Of]]. Narrow, shuffle-free,
  * O(shingles) md5 calls (two per shingle). */
case class Simhash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any =
    DedupKernels.simhash64(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.DedupKernels.simhash64($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `hyperplane_sig(vec)`: up to 64 random-hyperplane sign bits packed
  * into a long — the single-pass codegen kernel behind
  * [[graft.dedup.Dedup.hyperplanePairs]]'s banding. The planes ride
  * into generated code as ONE reference object, not as P inlined
  * literal-array dot products: the expression-tree form blew past
  * Janino/JIT method limits at 64 planes and fell out of codegen
  * (measured 34 s vs 3 s candidate generation on a 20k x 64-dim
  * corpus). Band b's key is `(sig >>> b*bits) & (2^bits - 1)`, so the
  * banding itself stays plain codegen'd bit arithmetic. A null vector
  * yields a null signature and therefore no candidates (the old
  * expression tree quietly CASE-defaulted null dots into bucket 0). */
case class HyperplaneSignature(child: Expression, planes: Array[Float],
    dim: Int) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(v: Any): Any =
    DedupKernels.hyperplaneSig(v.asInstanceOf[ArrayData], planes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.DedupKernels.hyperplaneSig($c, $ref, $dim)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `bloom_sketch_contains(s)`: membership probe of a driver-built
  * [[org.apache.spark.util.sketch.BloomFilter]] (the sketch
  * `DataFrameStatFunctions.bloomFilter` returns). The filter rides
  * into generated code as one reference object, so the probe stays
  * inside whole-stage codegen — this is the prefilter that lets
  * [[graft.dedup.Dedup.incrementalDedup]] route only might-be-duplicate
  * rows into the anti-join shuffle. No false negatives: a `false`
  * probe is a guaranteed-new row. */
case class BloomSketchContains(child: Expression,
    filter: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_sketch_contains"

  // probe the UTF-8 bytes directly: putString hashes the string's
  // UTF-8 encoding, so mightContainBinary(getBytes) is equivalent and
  // skips the per-row UTF8String -> String -> byte[] round-trip on
  // what is by design a full-scan hot path
  override def nullSafeEval(v: Any): Any =
    filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter,
      "org.apache.spark.util.sketch.BloomFilter")
    defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
