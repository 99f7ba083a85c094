package graft

import java.nio.file.{Files, Paths}
import java.nio.{ByteBuffer, ByteOrder}
import graft.sources.Dotvecs

/** fvecs/ivecs/bvecs: golden bytes, round-trip, corrupt-record error. */
class DotvecsSpec extends SparkSpec {

  test("fvecs golden bytes decode to the expected vectors") {
    // two records, dim 2: [1.0, 2.5], [-0.5, 3.0]
    val buf = ByteBuffer.allocate(2 * (4 + 8)).order(ByteOrder.LITTLE_ENDIAN)
    Seq(Seq(1.0f, 2.5f), Seq(-0.5f, 3.0f)).foreach { v =>
      buf.putInt(2); v.foreach(buf.putFloat)
    }
    val f = Files.createTempFile("golden", ".fvecs")
    Files.write(f, buf.array())
    val rows = Dotvecs.readFvecs(spark, f.toString)
      .orderBy("row_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getSeq[Float](1) == Seq(1.0f, 2.5f))
    assert(rows(1).getSeq[Float](1) == Seq(-0.5f, 3.0f))
  }

  test("ivecs and bvecs decode (ground-truth id files)") {
    val iv = ByteBuffer.allocate(2 * (4 + 12)).order(ByteOrder.LITTLE_ENDIAN)
    Seq(Seq(7, 8, 9), Seq(100, 200, 300)).foreach { v =>
      iv.putInt(3); v.foreach(iv.putInt)
    }
    val fi = Files.createTempFile("golden", ".ivecs")
    Files.write(fi, iv.array())
    val ivRows = Dotvecs.readIvecs(spark, fi.toString).orderBy("row_id").collect()
    assert(ivRows(1).getSeq[Int](1) == Seq(100, 200, 300))

    val bv = ByteBuffer.allocate(2 * (4 + 4)).order(ByteOrder.LITTLE_ENDIAN)
    Seq(Seq(0, 127, 128, 255), Seq(1, 2, 3, 4)).foreach { v =>
      bv.putInt(4); v.foreach(x => bv.put(x.toByte))
    }
    val fb = Files.createTempFile("golden", ".bvecs")
    Files.write(fb, bv.array())
    val bvRows = Dotvecs.readBvecs(spark, fb.toString).orderBy("row_id").collect()
    assert(bvRows(0).getSeq[Int](1) == Seq(0, 127, 128, 255)) // u8 widening
  }

  test("write-then-read round-trips the embeddings table") {
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
      .orderBy("vec_id")
    val vecs = emb.collect().map(_.getSeq[Float](1).toArray)
    val f = Files.createTempFile("rt", ".fvecs").toString
    val n = Dotvecs.writeFvecs(spark, f, vecs.iterator)
    assert(n == vecs.length)
    val back = Dotvecs.readFvecs(spark, f).orderBy("row_id").collect()
    assert(back.length == vecs.length)
    assert(back.zip(vecs).forall { case (r, v) =>
      r.getSeq[Float](1) == v.toSeq
    })
  }

  test("a record with mismatched dimension raises") {
    val buf = ByteBuffer.allocate(2 * (4 + 8)).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(2); buf.putFloat(1f); buf.putFloat(2f)
    buf.putInt(3); buf.putFloat(1f); buf.putFloat(2f) // lies about dim
    val f = Files.createTempFile("bad", ".fvecs")
    Files.write(f, buf.array())
    val e = intercept[Exception] {
      Dotvecs.readFvecs(spark, f.toString).collect()
    }
    assert(e.getMessage.contains("dimension") ||
      e.getCause != null && e.getCause.getMessage.contains("dimension"))
  }
}
