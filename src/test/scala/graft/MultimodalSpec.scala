package graft

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.functions._
import graft.functions.{image_meta, byte_histogram, frame_sample_hashes, pcm16_stats}

/** Multimodal binary-column operators: container-header parsing, byte
  * histograms, frame-sample hashing, PCM16 stats. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(26)
    b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes) // chunk length + type
    b.putInt(w).putInt(h).put(8.toByte).put(6.toByte)
    b.array()
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(13).order(ByteOrder.LITTLE_ENDIAN)
    b.put("GIF89a".getBytes)
    b.putShort(w.toShort).putShort(h.toShort)
    b.array()
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(30)
    b.put(Array(0xff, 0xd8).map(_.toByte)) // SOI
    b.put(Array(0xff, 0xe0).map(_.toByte)).putShort(6).putInt(0) // APP0 len 6
    b.put(Array(0xff, 0xc0).map(_.toByte)).putShort(11) // SOF0
    b.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    b.array()
  }

  test("image_meta parses PNG, GIF, JPEG headers; null otherwise") {
    val df = Seq(
      (1L, pngBytes(640, 480)), (2L, gifBytes(32, 16)),
      (3L, jpegBytes(800, 600)), (4L, "not an image".getBytes)
    ).toDF("id", "media")
    val rows = df.select(col("id"), image_meta(col("media")).as("m"))
      .orderBy("id").collect()
    assert(rows(0).getStruct(1).toSeq == Seq("png", 640, 480))
    assert(rows(1).getStruct(1).toSeq == Seq("gif", 32, 16))
    assert(rows(2).getStruct(1).toSeq == Seq("jpeg", 800, 600))
    assert(rows(3).isNullAt(1))
  }

  test("byte_histogram is normalized and deterministic") {
    val df = Seq(Tuple1(Array.tabulate[Byte](256)(_.toByte))).toDF("b")
    val h = df.select(byte_histogram(col("b"), 16).as("h"))
      .collect()(0).getSeq[Double](0)
    assert(h.length == 16)
    assert(h.forall(x => math.abs(x - 1.0 / 16) < 1e-12)) // uniform bytes
    assert(math.abs(h.sum - 1.0) < 1e-9)
  }

  test("frame_sample_hashes covers the payload in order") {
    val payload = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val df = Seq(Tuple1(payload)).toDF("b")
    val frames = df.select(frame_sample_hashes(col("b"), 4).as("f"))
      .collect()(0).getSeq[String](0)
    assert(frames.length == 4)
    assert(frames.distinct.length == 4)
    // first chunk hash equals md5 of the first 250 bytes
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(payload, 0, 250)
    assert(frames(0) == md.digest().map(x => f"$x%02x").mkString)
  }

  test("media and bloom functions are callable from spark.sql") {
    graft.functions.registerAll(spark)
    Seq((1L, "payload bytes".getBytes)).toDF("id", "b")
      .createOrReplaceTempView("media_t")
    val r = spark.sql(
      """SELECT byte_histogram(b, 8) AS h, frame_sample_hashes(b, 2) AS f,
        |  pcm16_stats(b).n_samples AS n,
        |  elem_in_bloom(5, array_to_bloom(array(1L, 5L, 9L))) AS hit
        |FROM media_t""".stripMargin).collect()(0)
    assert(r.getSeq[Double](0).length == 8)
    assert(r.getSeq[String](1).length == 2)
    assert(r.getInt(2) == 6)
    assert(r.getBoolean(3))
  }

  test("decode_image_stats really decodes pixels: PNG round-trips exactly") {
    import org.apache.spark.sql.graft.MediaKernels
    // gradient image with known channel means
    val png = MediaKernels.encodePng(16, 8, (x, y) =>
      ((10 + x) << 16) | ((20 + 5 * y) << 8) | 99)
    val df = Seq((1L, png), (2L, "definitely not an image".getBytes))
      .toDF("id", "img")
    val rows = df.select(col("id"),
        graft.functions.decode_image_stats(col("img")).as("st"))
      .orderBy("id").collect()
    val st = rows(0).getStruct(1)
    assert(st.getInt(0) == 16 && st.getInt(1) == 8)
    assert(math.abs(st.getDouble(2) - (10 + 7.5)) < 1e-9) // mean of 10..25
    assert(math.abs(st.getDouble(3) - (20 + 5 * 3.5)) < 1e-9) // mean of 20,25..55
    assert(math.abs(st.getDouble(4) - 99.0) < 1e-9)
    assert(rows(1).isNullAt(1), "undecodable payload must be null")
    // the real decode agrees with the header-only parser on dimensions
    val meta = df.filter(col("id") === 1)
      .select(image_meta(col("img")).as("m")).collect()(0).getStruct(0)
    assert(meta.getString(0) == "png" && meta.getInt(1) == 16 && meta.getInt(2) == 8)
  }

  test("resample_image_stats takes an exact nearest-neighbor grid") {
    import org.apache.spark.sql.graft.MediaKernels
    // 8x4 image; 2x2 thumbnail samples (0,0),(4,0),(0,2),(4,2)
    val png = MediaKernels.encodePng(8, 4, (x, y) =>
      ((x * 10) << 16) | ((y * 20) << 8) | 7)
    val df = Seq(Tuple1(png)).toDF("img")
    val st = df.select(
        graft.functions.resample_image_stats(col("img"), 2, 2).as("st"))
      .collect()(0).getStruct(0)
    assert(st.getInt(0) == 2 && st.getInt(1) == 2)
    assert(math.abs(st.getDouble(2) - (0 + 40 + 0 + 40) / 4.0) < 1e-9)
    assert(math.abs(st.getDouble(3) - (0 + 0 + 40 + 40) / 4.0) < 1e-9)
    assert(math.abs(st.getDouble(4) - 7.0) < 1e-9)
  }

  test("image_dhash: gradient direction sets bits; near-identical images nearly collide") {
    import org.apache.spark.sql.graft.MediaKernels
    // strictly increasing horizontal gradient -> every comparison true
    val up = MediaKernels.encodePng(9, 8, (x, _) => (x * 20) << 16)
    // constant image -> no comparison true
    val flat = MediaKernels.encodePng(9, 8, (_, _) => 0x808080)
    // one flipped cell changes a handful of bits, not the whole hash
    val dent = MediaKernels.encodePng(9, 8, (x, y) =>
      if (x == 4 && y == 2) 0 else (x * 20) << 16)
    val df = Seq((1L, up), (2L, flat), (3L, dent),
      (4L, "not an image".getBytes)).toDF("id", "img")
    val out = df.select(col("id"),
        graft.functions.image_dhash(col("img")).as("h"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "ffffffffffffffff")
    assert(out(1).getString(1) == "0000000000000000")
    val hamming = out(0).getString(1).zip(out(2).getString(1)).map {
      case (a, b) => Integer.bitCount(
        Integer.parseInt(a.toString, 16) ^ Integer.parseInt(b.toString, 16))
    }.sum
    assert(hamming >= 1 && hamming <= 4,
      s"a one-cell dent should flip 1-4 bits, got $hamming")
    assert(out(3).isNullAt(1), "undecodable payload must be null")
  }

  test("pcm16_stats computes peak and rms of a square wave") {
    val n = 100
    val b = ByteBuffer.allocate(2 * n).order(ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i => b.putShort(if (i % 2 == 0) 1000 else -1000))
    val df = Seq(Tuple1(b.array())).toDF("b")
    val s = df.select(pcm16_stats(col("b")).as("s")).collect()(0).getStruct(0)
    assert(s.getInt(0) == n)
    assert(s.getInt(1) == 1000)
    assert(math.abs(s.getDouble(2) - 1000.0) < 1e-9)
  }

  test("wav_meta walks the RIFF chunk list and decodes PCM16 data") {
    import org.apache.spark.sql.graft.MediaKernels
    val samples = Array.tabulate[Short](64)(i => if (i % 2 == 0) 1200 else -300)
    val wav = MediaKernels.encodeWav(8000, 1, samples)
    // the encoder inserts a LIST chunk between fmt and data, so byte 44
    // is NOT the start of samples — a fixed-offset reader would see the
    // LIST header bytes as audio; require the chunk actually sits there
    assert(new String(wav, 36, 4, java.nio.charset.StandardCharsets.US_ASCII)
      == "LIST")
    val df = Seq((1L, wav), (2L, "RIFFxxxxWAVE".getBytes),
        (3L, "not audio at all".getBytes))
      .toDF("id", "wav")
    val rows = df.select(col("id"),
        graft.functions.wav_meta(col("wav")).as("m"))
      .orderBy("id").collect()
    val m = rows(0).getStruct(1)
    assert(m.getInt(0) == 1) // channels
    assert(m.getInt(1) == 8000) // sample rate
    assert(m.getInt(2) == 16) // bits
    assert(m.getLong(3) == 64L) // frames
    assert(m.getInt(4) == 1200) // peak
    val expRms = math.sqrt((1200.0 * 1200 + 300.0 * 300) / 2)
    assert(math.abs(m.getDouble(5) - expRms) < 1e-9)
    assert(rows(1).isNullAt(1)) // truncated container
    assert(rows(2).isNullAt(1)) // not RIFF

    // stereo; the encoder's LIST chunk is odd-sized (9 bytes), so the
    // walk must skip its pad byte or the data chunk header is misread
    val stereo = MediaKernels.encodeWav(44100, 2,
      Array[Short](100, -200, 300, -400))
    val st = df.sparkSession.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(stereo)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("wav",
            org.apache.spark.sql.types.BinaryType))))
      .select(graft.functions.wav_meta(col("wav")).as("m"))
      .collect()(0).getStruct(0)
    assert(st.getInt(0) == 2 && st.getInt(1) == 44100)
    assert(st.getLong(3) == 2L) // 4 samples / 2 channels = 2 frames
    assert(st.getInt(4) == 400)
  }

  test("gif_frames decodes the animated frame sequence exactly") {
    import org.apache.spark.sql.graft.MediaKernels
    val colors = Seq(0x112233, 0x445566, 0x778899, 0xaabbcc)
    val gif = MediaKernels.encodeGifSolid(8, 4, colors)
    val df = Seq((1L, gif), (2L, "GIF89a-but-not-really".getBytes),
        (3L, pngBytes(4, 4))) // a non-GIF image payload
      .toDF("id", "gif")
    val rows = df.select(col("id"),
        graft.functions.gif_frames(col("gif"), 4).as("g"))
      .orderBy("id").collect()
    val g = rows(0).getStruct(1)
    assert(g.getInt(0) == 4) // n_frames
    val frames = g.getSeq[org.apache.spark.sql.Row](1)
    assert(frames.length == 4)
    frames.zip(colors).foreach { case (f, c) =>
      assert(f.getInt(0) == 8 && f.getInt(1) == 4)
      // solid single-color frames palettize exactly: mean == channel
      assert(f.getDouble(2) == ((c >> 16) & 0xff).toDouble)
      assert(f.getDouble(3) == ((c >> 8) & 0xff).toDouble)
      assert(f.getDouble(4) == (c & 0xff).toDouble)
    }
    assert(rows(1).isNullAt(1)) // mangled GIF payload
    assert(rows(2).isNullAt(1)) // PNG is not a GIF

    // sampling grid: k=2 over 4 frames picks indices 0 and 2
    val sampled = Seq(Tuple1(gif)).toDF("gif")
      .select(graft.functions.gif_frames(col("gif"), 2).as("g"))
      .collect()(0).getStruct(0)
    val sf = sampled.getSeq[org.apache.spark.sql.Row](1)
    assert(sf.length == 2)
    assert(sf(0).getDouble(2) == 0x11.toDouble)
    assert(sf(1).getDouble(2) == 0x77.toDouble)
  }

  test("mp4_meta walks boxes: largesize mdat, free box, moov after mdat, v0/v1 mvhd") {
    import org.apache.spark.sql.graft.MediaKernels
    val v0 = MediaKernels.encodeMp4(0, 600, 1234L, 320, 180, moovFirst = true)
    val v1 = MediaKernels.encodeMp4(1, 90000, 5678L, 640, 360, moovFirst = false)
    val rows = Seq((0L, v0), (1L, v1), (2L, Array[Byte](1, 2, 3)))
      .toDF("id", "mp4")
      .select(col("id"), graft.functions.mp4_meta(col("mp4")).as("m"))
      .orderBy("id").collect()
    val m0 = rows(0).getStruct(1)
    assert(m0.getString(0) == "isom")
    assert(m0.getInt(1) == 2) // tracks
    assert(m0.getInt(2) == 600)
    assert(math.abs(m0.getDouble(3) - 1234.0 * 1000 / 600) < 1e-9)
    assert(m0.getInt(4) == 320 && m0.getInt(5) == 180)
    val m1 = rows(1).getStruct(1) // 64-bit times + non-faststart layout
    assert(m1.getInt(2) == 90000)
    assert(math.abs(m1.getDouble(3) - 5678.0 * 1000 / 90000) < 1e-9)
    assert(m1.getInt(4) == 640 && m1.getInt(5) == 360)
    assert(rows(2).isNullAt(1)) // not a BMFF payload

    // malformed: a zero-payload tkhd box at the very end of the buffer
    // must yield null, not an index exception out of codegen
    def beBox(typ: String, payload: Array[Byte]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(8 + payload.length)
      buf.putInt(8 + payload.length).put(typ.getBytes).put(payload)
      buf.array()
    }
    val ftyp = beBox("ftyp", "isom\u0000\u0000\u0000\u0000".getBytes)
    val evil = ftyp ++ beBox("moov", beBox("trak", beBox("tkhd", Array.empty)))
    val evilRow = Seq(Tuple1(evil)).toDF("mp4")
      .select(graft.functions.mp4_meta(col("mp4")).as("m")).collect()(0)
    assert(evilRow.isNullAt(0))
  }

  test("mp4_meta reads the sample table: stts run-lengths, both stsz forms") {
    import org.apache.spark.sql.graft.MediaKernels
    // uniform stsz (every sample 600 bytes) + per-sample table form
    val uni = MediaKernels.encodeMp4(0, 600, 1234L, 320, 180,
      moovFirst = true, sampleSizes = Seq.fill(7)(600))
    val tbl = MediaKernels.encodeMp4(1, 90000, 5678L, 640, 360,
      moovFirst = false, sampleSizes = (1 to 5).map(_ * 100))
    val none = MediaKernels.encodeMp4(0, 600, 9L, 160, 90, moovFirst = true)
    val rows = Seq((0L, uni), (1L, tbl), (2L, none)).toDF("id", "mp4")
      .select(col("id"), graft.functions.mp4_meta(col("mp4")).as("m"))
      .orderBy("id").collect()
    val mu = rows(0).getStruct(1)
    assert(mu.getInt(6) == 7, "uniform stsz sample count")
    assert(mu.getLong(7) == 7L * 600, "uniform stsz total bytes")
    val mt = rows(1).getStruct(1)
    assert(mt.getInt(6) == 5, "table stsz sample count")
    assert(mt.getLong(7) == (1 to 5).map(_ * 100L).sum,
      "per-sample table total (a uniform-only reader gets this wrong)")
    val mn = rows(2).getStruct(1)
    assert(mn.getInt(6) == 0 && mn.getLong(7) == 0L,
      "no sample table -> zero counts, container still parses")

    // a container whose stts and stsz sample counts disagree is
    // malformed -> null (catches a reader trusting only one box)
    def patchInt(b: Array[Byte], at: Int, v: Int): Array[Byte] = {
      val c = b.clone()
      java.nio.ByteBuffer.wrap(c, at, 4).putInt(v)
      c
    }
    // find stsz, corrupt its sample_count field (offset +8 ver/flags
    // +4 uniform size -> +16 from the box header start)
    val idx = {
      val pat = "stsz".getBytes
      (0 until uni.length - 4).find(i => pat.indices.forall(j => uni(i + j) == pat(j))).get
    }
    val evil = patchInt(uni, idx + 4 + 8, 9) // count 9 vs stts total 7
    val evilRow = Seq(Tuple1(evil)).toDF("mp4")
      .select(graft.functions.mp4_meta(col("mp4")).as("m")).collect()(0)
    assert(evilRow.isNullAt(0), "stts/stsz count mismatch must read as malformed")

    // ADVICE r11: an unsigned sample count past Int range used to wrap
    // to a negative n_samples; it must read as malformed instead. The
    // huge uniform-form count also makes uniform*count exceed Long —
    // both hazards die at the same guard. (stts is patched to match so
    // the count-mismatch rule is not what rejects it.)
    val sttsIdx = {
      val pat = "stts".getBytes
      (0 until uni.length - 4).find(i => pat.indices.forall(j => uni(i + j) == pat(j))).get
    }
    // stts: entry_count 1, one (count=-1 unsigned, delta) entry
    val evilBig0 = patchInt(patchInt(uni, sttsIdx + 4 + 4, 1),
      sttsIdx + 4 + 8, -1)
    val evilBig = patchInt(evilBig0, idx + 4 + 8, -1) // stsz count = 2^32-1
    val bigRow = Seq(Tuple1(evilBig)).toDF("mp4")
      .select(graft.functions.mp4_meta(col("mp4")).as("m")).collect()(0)
    assert(bigRow.isNullAt(0),
      "a sample count past Int range must read as malformed, not wrap")
  }

  test("mp4_meta reads the stsd codec fourcc; absent table -> null codec") {
    import org.apache.spark.sql.graft.MediaKernels
    val avc = MediaKernels.encodeMp4(0, 600, 1234L, 320, 180,
      moovFirst = true, sampleSizes = Seq.fill(4)(500), codec = "avc1")
    val hev = MediaKernels.encodeMp4(1, 90000, 5678L, 640, 360,
      moovFirst = false, sampleSizes = Seq(100, 200), codec = "hev1")
    val none = MediaKernels.encodeMp4(0, 600, 9L, 160, 90, moovFirst = true)
    val rows = Seq((0L, avc), (1L, hev), (2L, none)).toDF("id", "mp4")
      .select(col("id"),
        graft.functions.mp4_meta(col("mp4")).getField("codec").as("c"))
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "avc1")
    assert(rows(1).getString(1) == "hev1")
    assert(rows(2).isNullAt(1), "no sample description -> null codec")
  }

  test("mp3_meta walks VBR frames behind an ID3v2 tag; malformed -> null") {
    import org.apache.spark.sql.graft.MediaKernels
    val good = MediaKernels.encodeMp3(44100,
      Seq((128, 0), (192, 1), (224, 0)), id3Size = 41)
    val noTag = MediaKernels.encodeMp3(48000, Seq((160, 1)), id3Size = 0)
    val truncated = good.dropRight(3) // mid-frame cut
    val rows = Seq((0L, good), (1L, noTag), (2L, truncated))
      .toDF("id", "mp3")
      .select(col("id"), graft.functions.mp3_meta(col("mp3")).as("m"))
      .orderBy("id").collect()
    val m0 = rows(0).getStruct(1)
    assert(m0.getInt(0) == 3)
    assert(m0.getInt(1) == 44100)
    assert(math.abs(m0.getDouble(2) - 3 * 1152.0 / 44100) < 1e-9)
    assert(math.abs(m0.getDouble(3) - (128 + 192 + 224) / 3.0) < 1e-9)
    val m1 = rows(1).getStruct(1)
    assert(m1.getInt(0) == 1 && m1.getInt(1) == 48000)
    assert(rows(2).isNullAt(1)) // truncated final frame
  }

  test("image_embed: centered thumbnail features from a real decode") {
    import org.apache.spark.sql.graft.MediaKernels
    val png = MediaKernels.encodePng(16, 8, (x, y) => {
      val v = (x * 16 + y) % 256; (v << 16) | (v << 8) | v
    })
    val e = Seq((1L, png)).toDF("id", "img")
      .select(graft.functions.image_embed(col("img"), 8, 8).as("e"))
      .collect()(0).getSeq[Float](0)
    assert(e.length == 64)
    // cell i samples source pixel (2*(i%8), i//8); gray == v; centered
    val vals = (0 until 64).map(i => ((2 * (i % 8)) * 16 + (i / 8)) % 256)
    val m = vals.sum.toDouble / 64
    (0 until 64).foreach(i =>
      assert(e(i) == (vals(i) - m).toFloat, s"cell $i"))
    assert(math.abs(e.map(_.toDouble).sum) < 1e-6, "mean-centered")
    // undecodable payload -> null
    assert(Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "img")
      .select(graft.functions.image_embed(col("img"), 8, 8))
      .collect()(0).isNullAt(0))
  }

  test("image near-dup pipeline groups planted one-pixel variants") {
    import org.apache.spark.sql.graft.MediaKernels
    // 40 pseudo-random images; d < 20 with d % 5 == 0 renders d+20's
    // image with the (0,0) pixel bumped — the q_image_semdedup corpus
    // at spec size
    val imgs = (0L until 40L).map { d =>
      val planted = d % 5 == 0 && d < 20
      val src = if (planted) d + 20 else d
      (d, MediaKernels.encodePng(16, 8, (x, y) => {
        val h1 = ((src * 128 + y * 16 + x) * 2654435761L) & 0xffffffffL
        val v0 = ((((h1 ^ (h1 >>> 16)) * 2246822519L) & 0xffffffffL)
          >>> 24).toInt
        val v = if (planted && x == 0 && y == 0) (v0 + 1) % 256 else v0
        (v << 16) | (v << 8) | v
      }))
    }.toDF("doc_id", "img")
    val emb = imgs.select(col("doc_id"),
      graft.functions.image_embed(col("img"), 8, 8).as("embedding"))
    val cand = graft.dedup.Dedup.hyperplanePairs(emb, col("doc_id"),
      col("embedding"), graft.queries.VectorQueries.hyperplanes,
      bands = 4, bitsPerBand = 16)
    val verified = cand
      .join(emb.select(col("doc_id").as("doc_a"), col("embedding").as("ea")),
        "doc_a")
      .join(emb.select(col("doc_id").as("doc_b"), col("embedding").as("eb")),
        "doc_b")
      .filter(graft.functions.cos_dist(col("ea"), col("eb")) <= 0.2)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 20L by 5L).map(d => (d, d + 20)).toSet
    assert(planted.subsetOf(verified),
      s"planted pairs missing: ${planted -- verified}")
    // and nothing unrelated verifies: all found pairs are planted
    assert(verified == planted, s"spurious pairs: ${verified -- planted}")
  }
}
