package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.ann.Metric
import org.apache.spark.sql.graft.PqKernels

/** Property tests for the distance and scalar-quantization kernels
  * (metric axioms and encode/decode bounds, independent of Spark). */
object DistanceProps extends Properties("distances") {

  private val pairGen: Gen[(Array[Float], Array[Float])] =
    Gen.choose(1, 64).flatMap { n =>
      for {
        a <- Gen.listOfN(n, Gen.choose(-100.0f, 100.0f))
        b <- Gen.listOfN(n, Gen.choose(-100.0f, 100.0f))
      } yield (a.toArray, b.toArray)
    }

  private val tripleGen = Gen.choose(1, 32).flatMap { n =>
    for {
      a <- Gen.listOfN(n, Gen.choose(-50.0f, 50.0f))
      b <- Gen.listOfN(n, Gen.choose(-50.0f, 50.0f))
      c <- Gen.listOfN(n, Gen.choose(-50.0f, 50.0f))
    } yield (a.toArray, b.toArray, c.toArray)
  }

  property("l2sq nonneg+symmetric+selfzero") = forAll(pairGen) { case (a, b) =>
    val d = Metric.L2Sq.dist(a, b)
    d >= 0.0 && d == Metric.L2Sq.dist(b, a) && Metric.L2Sq.dist(a, a) == 0.0
  }

  property("cos range+symmetric+selfzero") = forAll(pairGen) { case (a, b) =>
    val d = Metric.Cos.dist(a, b)
    Prop.all(
      Prop(d >= -1e-12 && d <= 2.0 + 1e-12),
      Prop(math.abs(d - Metric.Cos.dist(b, a)) < 1e-12),
      Prop(!a.exists(_ != 0f) || Metric.Cos.dist(a, a) < 1e-12))
  }

  property("sqrt(l2sq) triangle inequality") = forAll(tripleGen) {
    case (a, b, c) =>
      val ab = math.sqrt(Metric.L2Sq.dist(a, b))
      val bc = math.sqrt(Metric.L2Sq.dist(b, c))
      val ac = math.sqrt(Metric.L2Sq.dist(a, c))
      ac <= ab + bc + 1e-9
  }

  property("f16 round-trip within half-precision bound") =
    forAll(Gen.choose(-65000.0f, 65000.0f)) { x =>
      val r = PqKernels.halfToFloat(PqKernels.floatToHalf(x))
      val tol = math.max(math.abs(x) / 1024.0, 6.2e-5) // ulp + subnormal floor
      math.abs(x - r) <= tol
    }

  property("hamming sign-view metric axioms") = forAll(pairGen) { case (a, b) =>
    val d = Metric.Hamming.dist(a, b)
    d >= 0 && d <= a.length && d == Metric.Hamming.dist(b, a) &&
      Metric.Hamming.dist(a, a) == 0.0
  }

  property("HammingView expansion preserves bit-hamming exactly") =
    forAll(Gen.choose(1, 8).flatMap { n =>
      for {
        a <- Gen.listOfN(n, Gen.choose(Int.MinValue, Int.MaxValue))
        b <- Gen.listOfN(n, Gen.choose(Int.MinValue, Int.MaxValue))
      } yield (a.toArray, b.toArray)
    }) { case (a, b) =>
      // the sign-view float walk over expanded words must equal the
      // reference bit kernel bitCount(xor) for ANY int content — this
      // is the exactness claim the transparent hamming rewrite rests on
      val expanded =
        Metric.Hamming.dist(graft.ann.HammingView.expand(a),
          graft.ann.HammingView.expand(b))
      val reference = a.zip(b).map { case (x, y) =>
        java.lang.Integer.bitCount(x ^ y)
      }.sum.toDouble
      expanded == reference
    }

  property("DoubleIntHeap pops in heap order (min and max)") =
    forAll(Gen.listOf(Gen.choose(-1e6, 1e6))) { xs =>
      def drain(min: Boolean): Seq[Double] = {
        val h = new graft.ann.DoubleIntHeap(min)
        xs.zipWithIndex.foreach { case (k, v) => h.push(k, v) }
        val out = scala.collection.mutable.ArrayBuffer.empty[Double]
        while (h.nonEmpty) { out += h.topKey; h.pop() }
        out.toSeq
      }
      drain(min = true) == xs.sorted &&
        drain(min = false) == xs.sorted.reverse
    }
}
