package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multimodal (image/audio/video-as-bytes) kernels.
  *
  * The engine's convention for media at 100 TB scale: an opaque binary
  * column plus typed metadata, processed by narrow per-row expressions
  * (no shuffle). Container-header metadata parsing (PNG/GIF/JPEG/BMP
  * dimensions) is real and from the public format specs, and IMAGE
  * PIXEL DECODE is real for every container the JDK's pure-Java
  * `javax.imageio` readers cover (PNG/GIF/BMP/JPEG — [[decodeImageStats]]).
  * Only codec families outside the JDK (video codecs, compressed audio)
  * keep deterministic byte-level surrogates (chunk hashes, byte
  * histograms, PCM16 math), with the Spark-side plumbing — schemas,
  * batching, partitioning, the expression surface — real throughout.
  */
object MediaKernels {

  /** Result shape shared by the decode and resample expressions. */
  val ImageStatsType: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("mean_r", DoubleType), StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  // ImageIO defaults to a DISK-backed stream cache: every read/write
  // would spill each in-memory payload to a temp file — per row, inside
  // a hot expression, and failing outright on executors with a full or
  // unwritable java.io.tmpdir. The payloads are already byte arrays;
  // cache in memory. (JVM-global, set once at class load.)
  javax.imageio.ImageIO.setUseCache(false)

  /** Real pixel decode via the JDK's ImageIO (pure Java for
    * PNG/GIF/BMP/JPEG): (width, height, mean_r, mean_g, mean_b) over
    * the decoded RGB raster, or null when no installed reader accepts
    * the payload. Lossless containers round-trip exactly, so the means
    * are deterministic, oracle-checkable statistics. */
  def decodeImageStats(b: Array[Byte]): InternalRow = {
    val img = decode(b)
    if (img == null) null
    else sampledStats(img, img.getWidth, img.getHeight)
  }

  /** Real decode + nearest-neighbor resample (the pipeline brief's
    * "resize" step): source pixel (x*w/outW, y*h/outH) — integer
    * division, so the sampling grid is exact deterministic math on the
    * decoded raster, never an interpolation whose rounding could vary.
    * Returns (width, height, mean_r, mean_g, mean_b) of the resampled
    * image, or null when no reader accepts the payload. */
  def resampleImageStats(b: Array[Byte], outW: Int, outH: Int): InternalRow = {
    val img = decode(b)
    if (img == null) null else sampledStats(img, outW, outH)
  }

  private def decode(b: Array[Byte]): java.awt.image.BufferedImage =
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    catch { case _: Exception => null }

  /** Channel means over the outW x outH nearest-neighbor grid (the
    * identity grid when out dims equal the image dims). Index math in
    * Long: x*w can exceed Int range for a wide source x large thumbnail
    * (the same discipline frameSampleHashes uses). */
  private def sampledStats(img: java.awt.image.BufferedImage,
      outW: Int, outH: Int): InternalRow = {
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * h / outH).toInt
      var x = 0
      while (x < outW) {
        val p = img.getRGB((x.toLong * w / outW).toInt, sy)
        sr += (p >> 16) & 0xff
        sg += (p >> 8) & 0xff
        sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = math.max(outW.toLong * outH, 1L).toDouble
    InternalRow(outW, outH, sr / n, sg / n, sb / n)
  }

  /** Deterministic PNG encoder (test/data-generation helper): pixel
    * (x, y) takes the packed 0xRRGGBB value of `rgb(x, y)`. */
  def encodePng(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** (format, width, height) from image container headers; null if not
    * a recognized container. */
  def imageMeta(b: Array[Byte]): InternalRow = {
    def u16be(i: Int) = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u16le(i: Int) = ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
    def u32be(i: Int) =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    def u32le(i: Int) =
      ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
        ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
    def row(fmt: String, w: Int, h: Int) =
      InternalRow(UTF8String.fromString(fmt), w, h)

    if (b.length >= 24 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G') {
      row("png", u32be(16), u32be(20))
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') {
      row("gif", u16le(6), u16le(8))
    } else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      row("bmp", u32le(18), u32le(22))
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // JPEG: walk segments to the first SOF marker
      var i = 2
      while (i + 9 < b.length) {
        if ((b(i) & 0xff) != 0xff) return null
        val marker = b(i + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          return row("jpeg", u16be(i + 7), u16be(i + 5))
        }
        i += 2 + u16be(i + 2)
      }
      null
    } else null
  }

  /** Normalized byte histogram with `bins` buckets of width 256/bins —
    * the deterministic feature surrogate for decoded-pixel statistics. */
  def byteHistogram(b: Array[Byte], bins: Int): GenericArrayData = {
    val width = 256 / bins
    val counts = new Array[Int](bins)
    var i = 0
    while (i < b.length) {
      counts((b(i) & 0xff) / width) += 1
      i += 1
    }
    val n = math.max(b.length, 1).toDouble
    new GenericArrayData(counts.map(c => c / n: Any))
  }

  /** Deterministic "frame sample": split the payload into n equal byte
    * ranges and md5 each — the decode-free stand-in for video frame
    * extraction (same chunking a real codec stage would parallelize
    * over). */
  def frameSampleHashes(b: Array[Byte], frames: Int): GenericArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](frames)
    var i = 0
    while (i < frames) {
      val start = (i.toLong * b.length / frames).toInt
      val end = ((i + 1).toLong * b.length / frames).toInt
      md.reset()
      md.update(b, start, end - start)
      out(i) = UTF8String.fromString(
        md.digest().map(x => f"$x%02x").mkString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Audio stats treating the payload as PCM16 little-endian: (samples,
    * peak, rms) — real DSP arithmetic, usable as the deterministic fake
    * for codec-backed decode. */
  def pcm16Stats(b: Array[Byte]): InternalRow = {
    val n = b.length / 2
    var peak = 0
    var sumSq = 0.0
    var i = 0
    while (i < n) {
      val s = ((b(2 * i + 1) << 8) | (b(2 * i) & 0xff)).toShort.toInt
      val a = math.abs(s)
      if (a > peak) peak = a
      sumSq += s.toDouble * s.toDouble
      i += 1
    }
    InternalRow(n, peak, if (n == 0) 0.0 else math.sqrt(sumSq / n))
  }

  /** Result shape of [[gifFrameStats]]: frame count + the sampled
    * frames' decoded channel means. */
  val GifFramesType: StructType = StructType(Seq(
    StructField("n_frames", IntegerType),
    StructField("frames", ArrayType(ImageStatsType, containsNull = false))))

  /** REAL multi-frame decode (the video-analog path, pure JDK): reads
    * the animated-GIF frame sequence via ImageIO's gif reader and
    * returns stats of k sampled frames — frame index `i * n / k` for
    * sample i, the same deterministic grid [[frameSampleHashes]] uses
    * over bytes, but over ACTUAL decoded rasters. GIF is
    * palette-lossless, so the channel means are exact decode outputs.
    * Stats are of each frame's STORED raster (`reader.read(idx)`), not
    * the frame composited per GIF disposal rules: a delta-optimized
    * animation whose later frames encode only the changed sub-rectangle
    * reports that patch's dims/means — correct for full-frame GIFs
    * (this corpus), a documented approximation for optimized ones
    * (full compositing would need a disposal-method state machine).
    * Null when the payload is not a GIF ImageIO can read. Frame
    * sampling is the standard ingest shape for video-ish media at
    * scale: decode once, keep k representative frames, never ship the
    * full sequence downstream. */
  def gifFrameStats(b: Array[Byte], k: Int): InternalRow = {
    if (b.length < 6 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F') return null
    var stream: javax.imageio.stream.ImageInputStream = null
    try {
      stream = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      val readers = javax.imageio.ImageIO.getImageReaders(stream)
      if (!readers.hasNext) return null
      val reader = readers.next()
      try {
        reader.setInput(stream)
        val n = reader.getNumImages(true)
        if (n <= 0) return null
        val out = new Array[Any](k)
        var i = 0
        while (i < k) {
          val idx = ((i.toLong * n) / k).toInt
          val img = reader.read(idx)
          out(i) = sampledStats(img, img.getWidth, img.getHeight)
          i += 1
        }
        InternalRow(n, new GenericArrayData(out))
      } finally reader.dispose()
    } catch {
      case _: Exception => null
    } finally if (stream != null) stream.close()
  }

  /** Deterministic animated-GIF encoder (test/data-generation helper):
    * one solid-color frame per entry of `colors` — single-color frames
    * palettize exactly, so decode recovers the colors bit-for-bit. */
  def encodeGifSolid(w: Int, h: Int, colors: Seq[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      colors.foreach { c =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, c); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Result shape of [[wavMeta]]. */
  val WavMetaType: StructType = StructType(Seq(
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_samples", LongType),
    StructField("peak", IntegerType),
    StructField("rms", DoubleType)))

  @inline private def leInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  @inline private def leShort(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** REAL WAV container decode (public RIFF/WAVE format: the canonical
    * Microsoft multimedia file spec): walks the chunk list — `RIFF`
    * size `WAVE`, then (id, size, payload[, pad-to-even]) chunks — so
    * payloads with extra chunks (LIST/INFO, fact, cue) between `fmt `
    * and `data` parse correctly where a fixed-44-byte-header reader
    * would produce garbage. Returns (channels, sample_rate, bits,
    * n_samples, peak, rms) with the signal stats computed over the
    * REAL interleaved PCM16 samples of the `data` chunk (all channels
    * pooled; n_samples counts frames); null for payloads that are not
    * 16-bit integer PCM WAV. This retires the byte-surrogate for the
    * one audio container that needs no codec — compressed audio
    * (mp3/aac/ogg) stays a documented surrogate. */
  def wavMeta(b: Array[Byte]): InternalRow = {
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
      b(11) != 'E') return null
    var channels = 0; var rate = 0; var bits = 0; var blockAlign = 0
    var fmtSeen = false
    var off = 12
    while (off + 8 <= b.length) {
      val size = leInt(b, off + 4)
      // Long arithmetic: a malformed size near Int.MaxValue would wrap
      // `off + 8 + size` negative and sneak past an Int comparison,
      // then index out of bounds instead of returning null
      if (size < 0 || off.toLong + 8 + size > b.length) return null
      val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (id == "fmt ") {
        if (size < 16) return null
        val audioFormat = leShort(b, off + 8)
        channels = leShort(b, off + 10)
        rate = leInt(b, off + 12)
        blockAlign = leShort(b, off + 20)
        bits = leShort(b, off + 22)
        // PCM integer only (format 1); anything else needs a codec
        if (audioFormat != 1) return null
        fmtSeen = true
      } else if (id == "data") {
        if (!fmtSeen || bits != 16 || channels <= 0 || blockAlign <= 0)
          return null
        val start = off + 8
        val n = size / 2 // individual 16-bit samples across channels
        var peak = 0
        var sumSq = 0.0
        var i = 0
        while (i < n) {
          val s = ((b(start + 2 * i + 1) << 8) |
            (b(start + 2 * i) & 0xff)).toShort.toInt
          val a = math.abs(s)
          if (a > peak) peak = a
          sumSq += s.toDouble * s.toDouble
          i += 1
        }
        return InternalRow(channels, rate, bits, (size / blockAlign).toLong,
          peak, if (n == 0) 0.0 else math.sqrt(sumSq / n))
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      off += 8 + size + (size & 1)
    }
    null
  }

  /** Deterministic PCM16 WAV encoder (test/data-generation helper).
    * Deliberately writes an ODD-sized LIST chunk (9 bytes + 1 pad)
    * between `fmt ` and `data` so a reader that assumes the fixed
    * 44-byte layout — or forgets RIFF's pad-to-even rule — misreads
    * the data chunk; round-trip success proves [[wavMeta]] really
    * walks the chunk list. */
  def encodeWav(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val info = "INFOISFTg".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val dataBytes = samples.length * 2
    val listBytes = info.length // odd: exercises the pad byte
    val listPad = listBytes & 1
    val riffSize = 4 + (8 + 16) + (8 + listBytes + listPad) + (8 + dataBytes)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(riffSize).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort) // block align
    buf.putShort(16) // bits
    buf.put("LIST".getBytes).putInt(listBytes).put(info)
    if (listPad == 1) buf.put(0.toByte)
    buf.put("data".getBytes).putInt(dataBytes)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }
}

/** `image_meta(binary)` -> struct(format, width, height) or null. */
case class ImageMeta(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType), StructField("width", IntegerType),
    StructField("height", IntegerType)))
  override def nullable: Boolean = true
  override def prettyName: String = "image_meta"
  override def nullSafeEval(v: Any): Any =
    MediaKernels.imageMeta(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = org.apache.spark.sql.graft.MediaKernels.imageMeta($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `decode_image_stats(binary)` -> struct(width, height, mean_r,
  * mean_g, mean_b) from a REAL ImageIO pixel decode, or null for
  * payloads no installed reader accepts. */
case class DecodeImageStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = MediaKernels.ImageStatsType
  override def nullable: Boolean = true
  override def prettyName: String = "decode_image_stats"
  override def nullSafeEval(v: Any): Any =
    MediaKernels.decodeImageStats(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = org.apache.spark.sql.graft.MediaKernels.decodeImageStats($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `resample_image_stats(binary, outW, outH)` -> struct(width, height,
  * mean_r, mean_g, mean_b) of the nearest-neighbor-resampled decode. */
case class ResampleImageStats(child: Expression, outW: Int, outH: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(outW > 0 && outH > 0, "output dimensions must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = MediaKernels.ImageStatsType
  override def nullable: Boolean = true
  override def prettyName: String = "resample_image_stats"
  override def nullSafeEval(v: Any): Any =
    MediaKernels.resampleImageStats(v.asInstanceOf[Array[Byte]], outW, outH)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = org.apache.spark.sql.graft.MediaKernels.resampleImageStats($c, $outW, $outH);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `gif_frames(binary, k)` -> struct(n_frames, frames: array of
  * (width, height, mean_r, mean_g, mean_b)) — REAL multi-frame GIF
  * decode with k deterministically sampled frames; null for payloads
  * the gif reader rejects. */
case class GifFrames(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0, "sample count must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = MediaKernels.GifFramesType
  override def nullable: Boolean = true
  override def prettyName: String = "gif_frames"
  override def nullSafeEval(v: Any): Any =
    MediaKernels.gifFrameStats(v.asInstanceOf[Array[Byte]], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = org.apache.spark.sql.graft.MediaKernels.gifFrameStats($c, $k);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `wav_meta(binary)` -> struct(channels, sample_rate, bits,
  * n_samples, peak, rms) from a REAL RIFF/WAVE chunk-list parse +
  * PCM16 decode, or null for payloads that are not integer-PCM16 WAV. */
case class WavMeta(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = MediaKernels.WavMetaType
  override def nullable: Boolean = true
  override def prettyName: String = "wav_meta"
  override def nullSafeEval(v: Any): Any =
    MediaKernels.wavMeta(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = org.apache.spark.sql.graft.MediaKernels.wavMeta($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `byte_histogram(binary, bins)` -> array<double>, sums to 1. */
case class ByteHistogram(child: Expression, bins: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(256 % bins == 0, s"bins must divide 256, got $bins")
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "byte_histogram"
  override def nullSafeEval(v: Any): Any =
    MediaKernels.byteHistogram(v.asInstanceOf[Array[Byte]], bins)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MediaKernels.byteHistogram($c, $bins)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `frame_sample_hashes(binary, n)` -> array<string> of chunk md5s. */
case class FrameSampleHashes(child: Expression, frames: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(frames > 0, "frames must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "frame_sample_hashes"
  override def nullSafeEval(v: Any): Any =
    MediaKernels.frameSampleHashes(v.asInstanceOf[Array[Byte]], frames)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MediaKernels.frameSampleHashes($c, $frames)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `pcm16_stats(binary)` -> struct(n_samples, peak, rms). */
case class Pcm16Stats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", IntegerType), StructField("peak", IntegerType),
    StructField("rms", DoubleType)))
  override def prettyName: String = "pcm16_stats"
  override def nullSafeEval(v: Any): Any =
    MediaKernels.pcm16Stats(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MediaKernels.pcm16Stats($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
