package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
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

  override def serialize(buf: Array[Double]): Array[Byte] = {
    if (buf == null) return Array.emptyByteArray
    val bb = java.nio.ByteBuffer.allocate(buf.length * java.lang.Double.BYTES)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    if (bytes.isEmpty) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / java.lang.Double.BYTES)
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
