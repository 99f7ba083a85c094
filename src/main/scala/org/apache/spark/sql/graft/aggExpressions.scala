package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `vec_sum(array<double>)`: element-wise vector sum aggregate — the
  * primitive behind per-group embedding centroids (cluster centers,
  * per-language/domain mean vectors, the SemDeDup cluster stage).
  *
  * Spark shape: a TypedImperativeAggregate whose buffer is one
  * `double[dim]` per group — partial sums combine map-side, so a
  * billion-vector groupBy shuffles one array per (group, partition),
  * never the vectors. The merge IS the distributed combine.
  *
  * Determinism note: double addition is order-sensitive in the last
  * bits and partial-merge order is not fixed; feed values on an exact
  * binary grid (e.g. multiples of 1/16384 — float inputs widen
  * exactly) when bit-identical results across engines/runs matter,
  * exactly as the contract queries do. Vectors must share one
  * dimension (mismatch throws); null vectors are ignored like every
  * SQL aggregate; an all-null group sums to null. */
case class VectorSum(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum"

  override def createAggregationBuffer(): Array[Double] = null

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = if (buf == null) new Array[Double](n) else buf
    if (acc.length != n) throw new IllegalArgumentException(
      s"vec_sum: dimension mismatch (${acc.length} vs $n)")
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        "vec_sum: null vector element")
      acc(i) += arr.getDouble(i)
      i += 1
    }
    acc
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a == null) return b
    if (b == null) return a
    if (a.length != b.length) throw new IllegalArgumentException(
      s"vec_sum: dimension mismatch (${a.length} vs ${b.length})")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any =
    if (buf == null) null
    else new GenericArrayData(buf.map(x => x: Any))

  // one marker byte ahead of the data so a dim-0 buffer (a group of
  // empty vectors — a real, non-null sum) never aliases the null
  // sentinel: without it the result would depend on whether the
  // physical agg path happened to serialize the buffer
  override def serialize(buf: Array[Double]): Array[Byte] = {
    if (buf == null) return Array.emptyByteArray
    val bb = java.nio.ByteBuffer.allocate(1 + buf.length * java.lang.Double.BYTES)
    bb.put(1: Byte)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    if (bytes.isEmpty) return null
    val bb = java.nio.ByteBuffer.wrap(bytes, 1, bytes.length - 1)
    val out = new Array[Double]((bytes.length - 1) / java.lang.Double.BYTES)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VectorSum =
    copy(child = c)
}

/** `nearest_centroid_d(vec)`: argmin-l2sq centroid assignment over
  * DOUBLE vectors/centroids — the double-typed sibling of
  * [[NearestCentroid]] (which serves the float PQ/IVF path). K-means
  * rides this variant so the assignment arithmetic is bit-replayable
  * by a SQL oracle: grid-quantized inputs + exact-rational centroids
  * stay in double end-to-end, no float round-trips to mimic. Strict
  * less-than keeps the FIRST (lowest-index) centroid on ties. */
case class NearestCentroidD(child: Expression,
    centroids: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  require(centroids.nonEmpty &&
    centroids.forall(_.length == centroids(0).length),
    "expected equally sized centroid arrays")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid_d"

  override def nullSafeEval(v: Any): Any =
    AggKernels.nearestCentroidD(v.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.AggKernels.nearestCentroidD($c, $cents)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static kernels invoked from codegen (must be stable public methods). */
object AggKernels {
  def nearestCentroidD(v: ArrayData, cents: Array[Array[Double]]): Int = {
    val n = v.numElements()
    require(cents(0).length == n,
      s"expected equally sized arrays but got dimensions ${cents(0).length} and $n")
    // a null slot would read as an arbitrary value (typically 0.0) and
    // silently misassign — throw like vec_sum does (hoisted out of the
    // k×n distance loop)
    var j = 0
    while (j < n) {
      if (v.isNullAt(j)) throw new IllegalArgumentException(
        "nearest_centroid_d: null vector element")
      j += 1
    }
    var best = 0
    var bd = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var d = 0.0
      var i = 0
      while (i < n) {
        val x = v.getDouble(i) - ct(i)
        d += x * x
        i += 1
      }
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    best
  }
}
