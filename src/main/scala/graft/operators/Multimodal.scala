package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct. The Spark-side machinery
  * (schema, partition-preserving batch transform, feature schema) is real.
  *
  * Codecs: IMAGE decode is real — [[decodeImage]] reads PNG/BMP/JPEG/GIF
  * through the JDK's own ImageIO decoders (no native libraries) and
  * resamples to a luminance grid. AUDIO decode is real — [[decodeAudio]]
  * parses canonical PCM16LE RIFF directly (lock-free) and reads every
  * other WAV flavor (PCM 8/24-bit, A-law, µ-law) through
  * `javax.sound.sampled`, emitting duration/RMS/peak/zero-crossing
  * features. VIDEO codecs
  * (ffmpeg-class dependencies that don't exist in this environment) stay
  * behind clearly-marked deterministic stubs with the distributed plumbing
  * real, so swapping in a JNI/ffmpeg call touches only the decode
  * function. */
object Multimodal {

  // ImageIO defaults to a FILE-backed stream cache: every encode/decode
  // writes a temp file, which serializes 32 concurrent codec tasks on
  // disk IO. All payloads here are in-memory byte arrays — cache in heap.
  // Referenced from executor closures, so it runs once per JVM wherever
  // the codec work lands.
  javax.imageio.ImageIO.setUseCache(false)

  val MetaType: StructType = StructType(
    Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_bytes", IntegerType)
    )
  )

  /** Attach a payload column + metadata struct. `payloadHex` is any
    * hex-producing expression (in tests: md5 of the text — a deterministic
    * fake "image"). */
  def withPayload(df: DataFrame, payloadHexCol: String): DataFrame =
    df.withColumn("payload", unhex(col(payloadHexCol)))
      .withColumn(
        "meta",
        struct(
          lit("image/fake").as("mime"),
          lit(4).as("width"),
          lit(4).as("height"),
          length(col("payload")).as("n_bytes")
        )
      )

  /** STUB decode: a real implementation would decode the image and emit
    * pixel features. This deterministic fake maps each payload byte to a
    * float in [0,1) so the full distributed pipeline (batch iteration,
    * feature schema, downstream aggregation) is exercised end-to-end.
    * (Kept alongside [[decodeImage]]: the fake is oracle-expressible in
    * SQL, which the x20 correctness gate relies on.) */
  def decodeStub(payload: Array[Byte]): Array[Float] =
    payload.map(b => ((b & 0xff).toFloat) / 256.0f)

  /** REAL image decode via the JDK's ImageIO (PNG, BMP, JPEG, GIF — the
    * decoders the JVM ships; headless-safe, no native libs): area-averaged
    * luminance on a `grid`x`grid` raster in [0,1], row-major — the
    * fixed-width feature vector downstream dedup/similarity expects.
    * Returns None for undecodable/garbage payloads (callers keep the row
    * with null features rather than failing the task). */
  def decodeImage(payload: Array[Byte], grid: Int = 4): Option[(Array[Float], Int, Int)] =
    try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Float](grid * grid)
        var gy = 0
        while (gy < grid) {
          val y0 = gy * h / grid
          val y1 = math.max(y0 + 1, (gy + 1) * h / grid)
          var gx = 0
          while (gx < grid) {
            val x0 = gx * w / grid
            val x1 = math.max(x0 + 1, (gx + 1) * w / grid)
            var acc = 0.0
            var y = y0
            while (y < math.min(y1, h)) {
              var x = x0
              while (x < math.min(x1, w)) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xff
                val g = (rgb >> 8) & 0xff
                val b = rgb & 0xff
                acc += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
                x += 1
              }
              y += 1
            }
            val n = (math.min(x1, w) - x0).toLong * (math.min(y1, h) - y0)
            out(gy * grid + gx) = (acc / math.max(1L, n)).toFloat
            gx += 1
          }
          gy += 1
        }
        (out, w, h)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Distributed REAL-codec feature extraction: mapPartitions over binary
    * payloads, ImageIO decode per row, (id, features, width, height) out;
    * undecodable rows keep null features. Partition-preserving, no
    * shuffle — the same plumbing shape as [[extractFeatures]]. */
  def extractImageFeatures(df: DataFrame, idCol: String, grid: Int = 4): DataFrame = {
    val schema = StructType(
      Seq(
        StructField(idCol, df.schema(idCol).dataType),
        StructField("features", ArrayType(FloatType)),
        StructField("width", IntegerType),
        StructField("height", IntegerType)
      )
    )
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payIdx)
        val dec = if (payload == null) None else decodeImage(payload, grid)
        dec match {
          case Some((f, w, h)) => Row(r.get(idIdx), f, w, h)
          case None => Row(r.get(idIdx), null, null, null)
        }
      }
    }(Encoders.row(schema))
  }

  /** REAL audio decode: (frames, sampleRate, channels, duration s, RMS,
    * peak, zero-crossing rate), channels mixed down by average, amplitudes
    * normalized by 2^15. Returns None for undecodable payloads (callers
    * keep the row with null features).
    *
    * Canonical PCM16LE RIFF/WAVE payloads — the overwhelming bulk of any
    * real WAV corpus, and exactly what [[wavBytes]] emits — are parsed
    * DIRECTLY (RIFF chunk walk + fixed-point loop, no locks, fully
    * parallel across tasks). Everything else (8/24-bit, A-law, µ-law,
    * AIFF/AU) falls back to `javax.sound.sampled`, whose provider
    * registry takes a shared lock per `getAudioInputStream` call and
    * serializes concurrent decode tasks — the same lock family the synth
    * side dodges by emitting RIFF bytes directly. */
  def decodeAudio(payload: Array[Byte]): Option[(Long, Double, Int, Double, Double, Double, Double)] =
    if (payload == null) None
    else decodePcm16Riff(payload).orElse(decodeAudioJavax(payload))

  /** Lock-free fast path: walk the RIFF chunk list (word-aligned chunks;
    * extra LIST/fact/cue chunks skipped) and, for fmt code 1 (integer
    * PCM) at 16 bits, compute the features straight off the sample bytes.
    * A data chunk whose declared length overruns the payload is clamped —
    * the same tolerance `javax.sound` shows truncated streams. Returns
    * None (→ javax fallback) for any other layout. */
  private[graft] def decodePcm16Riff(
      p: Array[Byte]
  ): Option[(Long, Double, Int, Double, Double, Double, Double)] = {
    if (
      p.length < 44 ||
      p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
      p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E'
    ) return None
    val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var fmtCode = -1
    var channels = -1
    var rate = -1.0
    var bits = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= p.length && dataOff < 0) {
      val len = bb.getInt(off + 4)
      if (len < 0) return None
      val id = new String(p, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (id == "fmt " && len >= 16 && off + 8 + 16 <= p.length) {
        fmtCode = bb.getShort(off + 8) & 0xffff
        channels = bb.getShort(off + 10) & 0xffff
        rate = bb.getInt(off + 12).toDouble
        bits = bb.getShort(off + 22) & 0xffff
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = math.min(len.toLong, (p.length - dataOff).toLong).toInt
      }
      // a declared length overrunning the payload (truncated or garbage
      // chunk) ends the walk — `off + len` on int arithmetic could also
      // overflow negative and turn the loop guard into an out-of-bounds
      // read, so never advance past p.length
      if (len > p.length - off - 8) off = p.length
      else off += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (fmtCode != 1 || bits != 16 || channels < 1 || dataOff < 0) return None
    val frameBytes = channels * 2
    val nFrames = (dataLen / frameBytes).toLong
    var sumSq = 0.0
    var peak = 0.0
    var crossings = 0L
    var prevNonNeg = true
    var f = 0L
    var o = dataOff
    while (f < nFrames) {
      var acc = 0L
      var c = 0
      while (c < channels) { acc += bb.getShort(o + 2 * c); c += 1 }
      val s = acc.toDouble / channels
      sumSq += s * s
      val a = math.abs(s)
      if (a > peak) peak = a
      val nonNeg = s >= 0
      if (f > 0 && nonNeg != prevNonNeg) crossings += 1
      prevNonNeg = nonNeg
      f += 1
      o += frameBytes
    }
    Some((
      nFrames,
      rate,
      channels,
      if (rate > 0) nFrames / rate else 0.0,
      if (nFrames > 0) math.sqrt(sumSq / nFrames) / 32768.0 else 0.0,
      peak / 32768.0,
      if (nFrames > 1) crossings.toDouble / (nFrames - 1) else 0.0
    ))
  }

  /** `javax.sound.sampled` fallback (WAV PCM signed/unsigned 8/16/24-bit,
    * A-law, µ-law, plus AIFF/AU — the codecs the JVM ships; no native
    * libs). Non-PCM16 input converts through `AudioSystem`'s providers to
    * 16-bit signed PCM first. */
  private[graft] def decodeAudioJavax(
      payload: Array[Byte]
  ): Option[(Long, Double, Int, Double, Double, Double, Double)] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val src = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      val sf = src.getFormat
      val needConvert =
        sf.getEncoding != AudioFormat.Encoding.PCM_SIGNED || sf.getSampleSizeInBits != 16
      val target = new AudioFormat(
        AudioFormat.Encoding.PCM_SIGNED,
        sf.getSampleRate, 16, sf.getChannels, sf.getChannels * 2, sf.getSampleRate, false
      )
      val ais = if (needConvert) AudioSystem.getAudioInputStream(target, src) else src
      val fmt = ais.getFormat
      val channels = fmt.getChannels
      val bigEndian = fmt.isBigEndian
      val frameBytes = channels * 2
      var nFrames = 0L
      var sumSq = 0.0
      var peak = 0.0
      var crossings = 0L
      var prevNonNeg = true
      val buf = new Array[Byte](frameBytes * 4096)
      var read = ais.read(buf)
      while (read > 0) {
        var off = 0
        while (off + frameBytes <= read) {
          // mix channels down by average (mono passes through exactly)
          var acc = 0L
          var c = 0
          while (c < channels) {
            val lo = buf(off + 2 * c + (if (bigEndian) 1 else 0)) & 0xff
            val hi = buf(off + 2 * c + (if (bigEndian) 0 else 1)).toInt
            acc += (hi << 8) | lo
            c += 1
          }
          val s = acc.toDouble / channels
          sumSq += s * s
          val a = math.abs(s)
          if (a > peak) peak = a
          val nonNeg = s >= 0
          if (nFrames > 0 && nonNeg != prevNonNeg) crossings += 1
          prevNonNeg = nonNeg
          nFrames += 1
          off += frameBytes
        }
        read = ais.read(buf)
      }
      ais.close()
      val rate = fmt.getSampleRate.toDouble
      Some((
        nFrames,
        rate,
        channels,
        if (rate > 0) nFrames / rate else 0.0,
        if (nFrames > 0) math.sqrt(sumSq / nFrames) / 32768.0 else 0.0,
        peak / 32768.0,
        if (nFrames > 1) crossings.toDouble / (nFrames - 1) else 0.0
      ))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Build a WAV container from 16-bit PCM samples (interleaved when
    * `channels` > 1) — fixture/synthetic-payload seam for [[decodeAudio]].
    * Emits the canonical 44-byte PCM16LE RIFF/WAVE layout directly (the
    * same bytes `AudioSystem.write(Type.WAVE)` produces for this format):
    * the JDK writer funnels every call through a synchronized provider
    * registry, which serializes concurrent synth tasks — decode stays on
    * the real `javax.sound` path. */
  def wavBytes(samples: Array[Short], sampleRate: Float = 8000f, channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer
      .allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val rate = sampleRate.toInt
    val blockAlign = channels * 2
    bb.put("RIFF".getBytes(ascii)).putInt(36 + dataLen).put("WAVE".getBytes(ascii))
    bb.put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(rate)
      .putInt(rate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(16) // bits per sample
    bb.put("data".getBytes(ascii)).putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** Spread rows so per-row codec work uses every core: the synth/encode
    * stages (and the decode stages that inherit their partitioning) are
    * CPU-bound, and a small upstream parquet otherwise pins the whole
    * pipeline to one core. A partition-COUNT guard cannot detect that:
    * Spark byte-range-splits small files to defaultParallelism splits, but
    * parquet is row-group granular, so every row still lands in the one
    * split holding the row group. The repartition is unconditional — it
    * shuffles only the narrow pre-payload rows (ids), which is noise next
    * to the codec work it parallelizes. */
  private def widen(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Fill `img` with the 4x4-logical-px block texture `g(bx, by)` — one
    * mix64 per (block column, pixel row) and ONE bulk setRGB instead of a
    * synchronized per-pixel setRGB + per-pixel mix64 (identical pixels,
    * ~10x less texture CPU; profiled in r18 — the synth-payload stage of
    * the media queries is pure per-task compute, guide §1.2 step 2). */
  private[operators] def fillBlockTexture(
      img: java.awt.image.BufferedImage,
      w: Int,
      h: Int,
      scale: Int,
      g: (Int, Int) => Int
  ): Unit = {
    val px = new Array[Int](w * h)
    val bw = 4 * scale
    var y = 0
    while (y < h) {
      val by = (y / scale) / 4
      var x = 0
      while (x < w) {
        val bx = x / bw
        val gv = g(bx, by)
        val v = (gv << 16) | (gv << 8) | gv
        val xEnd = math.min(w, (bx + 1) * bw)
        var i = y * w + x
        while (x < xEnd) { px(i) = v; i += 1; x += 1 }
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
  }

  /** Attach a deterministic synthetic WAV payload per row: `n` mono 16-bit
    * samples at `sampleRate`, sample(i) = (id*31 + i*17) % 20001 - 10000 —
    * an expression the SQL oracle recomputes exactly (PCM16 round-trips
    * bit-exact through the WAV container). */
  def withSynthWavPayload(in: DataFrame, idCol: String, n: Int, sampleRate: Float): DataFrame = {
    val df = widen(in)
    val schema = StructType(df.schema.fields :+ StructField("payload", BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.get(idIdx) match {
          case l: Long => l
          case i: Int => i.toLong
          case other => throw new IllegalArgumentException(s"non-integral id $other")
        }
        val samples = Array.tabulate(n)(i => ((id * 31 + i.toLong * 17) % 20001 - 10000).toShort)
        Row.fromSeq(r.toSeq :+ wavBytes(samples, sampleRate))
      }
    }(Encoders.row(schema))
  }

  /** Distributed REAL audio feature extraction: mapPartitions over binary
    * payloads, `javax.sound.sampled` decode per row; undecodable rows keep
    * null features. Partition-preserving, no shuffle. */
  def extractAudioFeatures(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(
      Seq(
        StructField(idCol, df.schema(idCol).dataType),
        StructField("n_samples", LongType),
        StructField("sample_rate", DoubleType),
        StructField("channels", IntegerType),
        StructField("duration_s", DoubleType),
        StructField("rms", DoubleType),
        StructField("peak", DoubleType),
        StructField("zcr", DoubleType)
      )
    )
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payIdx)
        val dec = if (payload == null) None else decodeAudio(payload)
        dec match {
          case Some((n, rate, ch, dur, rms, peak, zcr)) =>
            Row(r.get(idIdx), n, rate, ch, dur, rms, peak, zcr)
          case None => Row(r.get(idIdx), null, null, null, null, null, null, null)
        }
      }
    }(Encoders.row(schema))
  }

  // ------------------------------------------------------------------
  // REAL video: AVI (RIFF) containers with MJPEG frames — pure JVM.
  // MJPEG-in-AVI is the one mainstream video format decodable without
  // native codecs: the container is RIFF chunk walking and every frame is
  // a JPEG the JDK's ImageIO already reads. Other codecs (H.264 etc.)
  // still fail loudly (decode returns None) — never silently fake.
  // ------------------------------------------------------------------

  final case class VideoInfo(
      width: Int,
      height: Int,
      nFrames: Int,
      fps: Double,
      codec: String
  )

  private def fourcc(bb: java.nio.ByteBuffer, at: Int): String = {
    val b = new Array[Byte](4)
    var i = 0
    while (i < 4) { b(i) = bb.get(at + i); i += 1 }
    new String(b, java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** Parse an AVI container: (video stream info, raw frame payloads in
    * stream order). None = not an AVI / malformed / no video stream. For
    * MJPEG each frame payload is a standalone JPEG that [[decodeImage]]
    * reads. `nFrames` counts the frames ACTUALLY present in `movi` (the
    * header's dwTotalFrames is advisory and real muxers get it wrong). */
  def decodeAvi(payload: Array[Byte]): Option[(VideoInfo, Vector[Array[Byte]])] =
    try {
      if (payload.length < 24) return None
      val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (fourcc(bb, 0) != "RIFF" || fourcc(bb, 8) != "AVI ") return None
      var width = 0; var height = 0
      var fps = 0.0; var codec = ""
      var sawVids = false
      val frames = Vector.newBuilder[Array[Byte]]
      // walk chunks in [from, until); LIST contents recurse
      def walk(from: Int, until: Int): Unit = {
        var p = from
        while (p + 8 <= until) {
          val id = fourcc(bb, p)
          val size = bb.getInt(p + 4)
          if (size < 0 || p + 8 + size > until) return // truncated: stop, keep what parsed
          if (id == "LIST") {
            val listType = fourcc(bb, p + 8)
            if (listType == "hdrl" || listType == "strl" || listType == "movi")
              walk(p + 12, p + 8 + size)
          } else if (id == "avih" && size >= 40) {
            val usec = bb.getInt(p + 8)
            if (fps == 0.0 && usec > 0) fps = 1e6 / usec
            width = bb.getInt(p + 8 + 32)
            height = bb.getInt(p + 8 + 36)
          } else if (id == "strh" && size >= 36) {
            val t = fourcc(bb, p + 8)
            if (t == "vids") {
              sawVids = true
              codec = fourcc(bb, p + 12).trim
              val scale = bb.getInt(p + 8 + 20)
              val rate = bb.getInt(p + 8 + 24)
              if (scale > 0 && rate > 0) fps = rate.toDouble / scale
            }
          } else if (
            id.length == 4 && id(0).isDigit && id(1).isDigit &&
            (id.substring(2) == "dc" || id.substring(2) == "db")
          ) {
            frames += java.util.Arrays.copyOfRange(payload, p + 8, p + 8 + size)
          }
          p += 8 + size + (size & 1) // chunks are word-aligned
        }
      }
      val riffSize = bb.getInt(4)
      walk(12, math.min(payload.length, 8 + riffSize))
      val fv = frames.result()
      if (!sawVids || width <= 0 || height <= 0) None
      else Some((VideoInfo(width, height, fv.length, fps, codec), fv))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Mux JPEG-encoded frames into a minimal valid AVI-MJPEG container
    * (fixture/writer seam — also proves the parser against real bytes). */
  def encodeAviMjpeg(jpegFrames: Seq[Array[Byte]], width: Int, height: Int, fps: Int): Array[Byte] = {
    require(jpegFrames.nonEmpty && fps > 0)
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(0, v); b.array()
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(id.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      o.write(le32(body.length)); o.write(body)
      if ((body.length & 1) == 1) o.write(0) // word alignment
      o.toByteArray
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write("LIST".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      o.write(le32(body.length + 4))
      o.write(listType.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      o.write(body)
      o.toByteArray
    }
    val n = jpegFrames.length
    val avih = {
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(0, 1000000 / fps) // dwMicroSecPerFrame
      b.putInt(16, n) // dwTotalFrames
      b.putInt(24, 1) // dwStreams
      b.putInt(32, width)
      b.putInt(36, height)
      b.array()
    }
    val strh = {
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("vids".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      b.put("MJPG".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      b.putInt(20, 1) // dwScale
      b.putInt(24, fps) // dwRate
      b.putInt(32, n) // dwLength
      b.putShort(52, width.toShort) // rcFrame right
      b.putShort(54, height.toShort) // rcFrame bottom
      b.array()
    }
    val strf = {
      val b = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(0, 40)
      b.putInt(4, width)
      b.putInt(8, height)
      b.putShort(12, 1) // biPlanes
      b.putShort(14, 24) // biBitCount
      b.put(16, 'M'.toByte); b.put(17, 'J'.toByte); b.put(18, 'P'.toByte); b.put(19, 'G'.toByte)
      b.putInt(20, width * height * 3)
      b.array()
    }
    val hdrl = list(
      "hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    )
    val movi = list("movi", jpegFrames.toArray.flatMap(f => chunk("00dc", f)))
    val body = hdrl ++ movi
    bos.write("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bos.write(le32(body.length + 4))
    bos.write("AVI ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bos.write(body)
    bos.toByteArray
  }

  /** Deterministic REAL AVI fixtures: per row a uniform-gray MJPEG video
    * whose geometry/rate/frame-count derive from the id — so a SQL oracle
    * can recompute the container metadata the decoder must report. */
  def withSynthAviPayload(in: DataFrame, idCol: String): DataFrame = {
    val df = widen(in)
    val schema = StructType(
      Seq(StructField(idCol, df.schema(idCol).dataType), StructField("payload", BinaryType))
    )
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.get(idIdx) match {
          case l: Long => l
          case i: Int => i.toLong
          case other => throw new IllegalArgumentException(s"non-integral id $other")
        }
        val w = 16 + (id % 3).toInt * 8
        val h = 8 + (id % 5).toInt * 8
        val n = 2 + (id % 4).toInt
        val fps = 5 + (id % 3).toInt * 5
        val jpegs = (0 until n).map { i =>
          val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val gray = ((id * 37 + i * 11) % 256).toInt
          val g = img.createGraphics()
          g.setColor(new java.awt.Color(gray, gray, gray))
          g.fillRect(0, 0, w, h)
          g.dispose()
          val o = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", o)
          o.toByteArray
        }
        Row(r.get(idIdx), encodeAviMjpeg(jpegs, w, h, fps))
      }
    }(Encoders.row(schema))
  }

  /** Distributed REAL video decode: container metadata + first-keyframe
    * luminance features (ImageIO on the MJPEG frame). Undecodable rows
    * null out — a corrupt cell must never fail the job. */
  def extractVideoFeatures(df: DataFrame, idCol: String, grid: Int = 4): DataFrame = {
    val schema = StructType(
      Seq(
        StructField(idCol, df.schema(idCol).dataType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("n_frames", IntegerType),
        StructField("fps", DoubleType),
        StructField("codec", StringType),
        StructField("first_frame", ArrayType(FloatType))
      )
    )
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payIdx)
        val dec = if (payload == null) None else decodeAvi(payload)
        dec match {
          case Some((info, frames)) =>
            val feat = frames.headOption.flatMap(decodeImage(_, grid)).map(_._1).orNull
            Row(r.get(idIdx), info.width, info.height, info.nFrames, info.fps, info.codec, feat)
          case None => Row(r.get(idIdx), null, null, null, null, null, null)
        }
      }
    }(Encoders.row(schema))
  }

  /** REAL frame fan-out: one AVI row → one row per contained frame
    * (id, frame_idx, frame JPEG bytes) — partition-preserving, the real-
    * codec replacement for [[sampleFrames]]' stub slicing. */
  def explodeVideoFrames(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(
      Seq(
        StructField(idCol, df.schema(idCol).dataType),
        StructField("frame_idx", IntegerType),
        StructField("frame", BinaryType)
      )
    )
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payIdx)
        val dec = if (payload == null) None else decodeAvi(payload)
        dec match {
          case Some((_, frames)) =>
            frames.iterator.zipWithIndex.map { case (f, i) => Row(r.get(idIdx), i, f) }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(schema))
  }

  /** Strided frame sampling over REAL video decode: keep every `every`-th
    * frame of each AVI payload (frame 0, every, 2*every, ...), emitting
    * (id, frame_idx, t_s, width, height, frame JPEG bytes) — the
    * training-pipeline "1 frame per N" sampler, with the media timestamp
    * (frame_idx / fps) attached for downstream alignment. Partition-
    * preserving fan-out like [[explodeVideoFrames]]; undecodable payloads
    * contribute no rows (a corrupt cell must never fail the job); fps <= 0
    * yields a null t_s rather than Infinity. */
  def sampleVideoFrames(df: DataFrame, idCol: String, every: Int): DataFrame = {
    require(every > 0, s"sampleVideoFrames: every must be positive, got $every")
    val schema = StructType(
      Seq(
        StructField(idCol, df.schema(idCol).dataType),
        StructField("frame_idx", IntegerType),
        StructField("t_s", DoubleType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("frame", BinaryType)
      )
    )
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payIdx)
        val dec = if (payload == null) None else decodeAvi(payload)
        dec match {
          case Some((info, frames)) =>
            Iterator.range(0, frames.length, every).map { i =>
              val t = if (info.fps > 0) java.lang.Double.valueOf(i / info.fps) else null
              Row(r.get(idIdx), i, t, info.width, info.height, frames(i))
            }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(schema))
  }

  /** STUB video frame extraction (kept for the x20 oracle, which re-
    * expresses this fake in SQL): a real container parse is [[decodeAvi]]/
    * [[explodeVideoFrames]] above. The fake derives `nFrames` deterministic
    * "frames" by slicing the payload with a stride, so the fan-out shape
    * (one row in, k rows out, frame index attached) is exercised exactly as
    * it would be with a real codec. */
  def sampleFramesStub(payload: Array[Byte], nFrames: Int): Seq[Array[Byte]] =
    (0 until nFrames).map { i =>
      // long arithmetic: i * length overflows Int for video-scale payloads
      // (300MB x frame 8 wraps negative and every late frame slices byte 0)
      val off = if (payload.isEmpty) 0 else (i.toLong * payload.length / nFrames).toInt
      payload.drop(off).take(math.max(1, payload.length / nFrames))
    }

  /** STUB resize: a real implementation is a bilinear/area resample. The
    * fake averages adjacent feature pairs (exactly halves the vector), so
    * output-shape contracts and the per-batch loop are real. */
  def resizeStub(features: Array[Float]): Array[Float] =
    features.grouped(2).map(p => p.sum / p.length).toArray

  /** Frame sampling as a distributed fan-out: one payload row becomes
    * `nFrames` frame rows (id, frame_idx, frame_bytes) — mapPartitions (the
    * Scala analog of `mapInPandas`), partition-preserving, no shuffle;
    * downstream per-frame decode/feature ops compose unchanged. */
  def sampleFrames(df: DataFrame, idCol: String, nFrames: Int): DataFrame = {
    require(nFrames > 0, s"nFrames must be positive, got $nFrames")
    val schema = StructType(
      Seq(
        StructField(idCol, df.schema(idCol).dataType),
        StructField("frame_idx", IntegerType),
        StructField("frame", BinaryType)
      )
    )
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payIdx)
        if (payload == null) Iterator.empty
        else
          sampleFramesStub(payload, nFrames).zipWithIndex.iterator.map { case (f, i) =>
            Row(r.get(idIdx), i, f)
          }
      }
    }(Encoders.row(schema))
  }

  /** Partition-preserving batched feature extraction over binary payloads —
    * the Scala analog of `mapInPandas`: iterate rows per partition, no
    * shuffle, emit (id, features, meta passthrough). */
  def extractFeatures(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(
      Seq(
        StructField(idCol, df.schema(idCol).dataType),
        StructField("features", ArrayType(FloatType)),
        StructField("n_bytes", IntegerType)
      )
    )
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payIdx)
        val feats = if (payload == null) null else decodeStub(payload)
        Row(r.get(idIdx), feats, if (payload == null) 0 else payload.length)
      }
    }(Encoders.row(schema))
  }

  // ------------------------------------------------------------------
  // Perceptual hashing (image near-dup)
  // ------------------------------------------------------------------

  private val PHashGrid = 32
  private val PHashBits = 63 // 8x8 low-frequency block minus the DC term

  /** Integral id/pattern extraction shared by the synth generators. */
  private def idLong(v: Any, what: String): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case other => throw new IllegalArgumentException(s"non-integral $what $other")
  }

  /** JPEG encode at an explicit quality (the default writer ignores
    * quality; dispose/close ordering matters — one copy of it). */
  private def encodeJpeg(img: java.awt.image.BufferedImage, quality: Float): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(o)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    o.toByteArray
  }

  /** (id, `outCol`) per decodable payload row via a partition-preserving
    * map — the shared projection under [[imagePHashes]] and
    * [[audioFingerprints]]; rows whose payload fails `f` drop (a corrupt
    * blob cannot be a near-duplicate of anything). */
  private def hashProjection(df: DataFrame, idCol: String, outCol: String)(
      f: Array[Byte] => Option[Long]
  ): DataFrame = {
    val schema = StructType(
      Seq(
        StructField(idCol, df.schema(idCol).dataType),
        StructField(outCol, LongType)
      )
    )
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payIdx)
        (if (payload == null) None else f(payload)).map(h => Row(r.get(idIdx), h))
      }
    }(Encoders.row(schema))
  }

  // orthonormal DCT-II basis, built once per JVM (32 x 32 doubles)
  private lazy val dctBasis: Array[Array[Double]] = {
    val n = PHashGrid
    Array.tabulate(n, n) { (u, x) =>
      val a = if (u == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)
      a * math.cos((2 * x + 1) * u * math.Pi / (2.0 * n))
    }
  }

  /** Exact fractional box-filter resample to n x n luminance: every
    * output cell integrates pixel luminance over the REAL-valued cell
    * rectangle `[gx·w/n, (gx+1)·w/n) x [gy·h/n, (gy+1)·h/n)` with
    * fractional edge coverage. Unlike an integer-division grid, this is
    * scale-consistent: an image upsampled by pixel replication produces
    * the identical n x n average, which is what makes the pHash
    * scale-robust. */
  private def boxLuminance(img: java.awt.image.BufferedImage, n: Int): Array[Double] = {
    val w = img.getWidth; val h = img.getHeight
    // NO h x w luminance matrix: a 50-megapixel crawl image would
    // transiently allocate ~400 MB of doubles per task. Pixels are read
    // straight off the raster inside the cell loops (a fractional-
    // boundary pixel is read at most 4x — cheap next to the allocation),
    // preserving the exact per-cell summation order, so hashes are
    // bit-identical to the matrix formulation.
    def lumAt(x: Int, y: Int): Double = {
      val rgb = img.getRGB(x, y)
      (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)) / 255.0
    }
    // 1-D fractional coverage weights for one axis of length `len`
    def weights(len: Int): Array[Array[(Int, Double)]] = Array.tabulate(n) { g =>
      val lo = g.toDouble * len / n
      val hi = (g + 1).toDouble * len / n
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
      var p = math.floor(lo).toInt
      while (p < hi && p < len) {
        val cover = math.min(hi, p + 1.0) - math.max(lo, p.toDouble)
        if (cover > 0) out += (p -> cover)
        p += 1
      }
      out.toArray
    }
    val wx = weights(w); val wy = weights(h)
    val out = new Array[Double](n * n)
    var gy = 0
    while (gy < n) {
      var gx = 0
      while (gx < n) {
        var acc = 0.0; var area = 0.0
        wy(gy).foreach { case (py, cy) =>
          wx(gx).foreach { case (px, cx) => acc += lumAt(px, py) * cy * cx; area += cy * cx }
        }
        out(gy * n + gx) = acc / area
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** 63-bit perceptual hash (pHash): decode → 32x32 fractional-box
    * luminance resample → 2-D DCT-II → the 8x8 low-frequency block minus
    * DC → bit i = coefficient i > median. Robust to re-encoding, quality
    * changes and resizing (the properties byte-level hashing lacks);
    * deterministic pure-double math. None for undecodable payloads. */
  def imagePHash(payload: Array[Byte]): Option[Long] =
    (try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }).map { img =>
      val lum = boxLuminance(img, PHashGrid)
      val n = PHashGrid
      // rows-then-columns separable DCT: T = B P Bᵀ, low 8x8 only
      val tmp = Array.ofDim[Double](8, n) // rows 0..7 of B·P
      var u = 0
      while (u < 8) {
        var y = 0
        while (y < n) {
          var acc = 0.0
          var x = 0
          while (x < n) { acc += dctBasis(u)(x) * lum(x * n + y); x += 1 }
          tmp(u)(y) = acc
          y += 1
        }
        u += 1
      }
      val coeffs = new Array[Double](PHashBits)
      var k = 0
      u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          if (u != 0 || v != 0) {
            var acc = 0.0
            var y = 0
            while (y < n) { acc += tmp(u)(y) * dctBasis(v)(y); y += 1 }
            coeffs(k) = acc
            k += 1
          }
          v += 1
        }
        u += 1
      }
      val sortedC = coeffs.sorted
      val median = (sortedC(PHashBits / 2 - 1) + sortedC(PHashBits / 2)) / 2.0
      var bits = 0L
      k = 0
      while (k < PHashBits) { if (coeffs(k) > median) bits |= (1L << k); k += 1 }
      bits
    }

  /** (id, phash) via partition-preserving real decode; undecodable rows
    * drop (a corrupt image cannot be a near-duplicate of anything). */
  def imagePHashes(df: DataFrame, idCol: String): DataFrame =
    hashProjection(df, idCol, "phash")(imagePHash)

  /** Banded-Hamming near-dup blocking over a 64-bit-or-less hash column:
    * the `nBits` hash bits split into `maxHamming + 1` bands; by
    * pigeonhole, any pair within the Hamming budget agrees on at least
    * one whole band — so the band-bucket equi-join has EXACT recall at
    * the threshold, and the verify step (`bit_count(xor)`) only
    * discards. The same sum(bucket²)-not-n² shape as SimHash/MinHash
    * blocking. Shared by [[pHashDupes]] and [[audioFpDupes]]. */
  private def hammingDupes(
      hashes: DataFrame,
      idCol: String,
      hashCol: String,
      nBits: Int,
      maxHamming: Int
  ): DataFrame = {
    require(
      maxHamming >= 0 && maxHamming < nBits,
      s"bad maxHamming $maxHamming for $nBits-bit hashes"
    )
    val nBands = maxHamming + 1
    val width = (nBits + nBands - 1) / nBands
    val bands = hashes.select(
      col(idCol),
      col(hashCol).as("__h"),
      posexplode(
        array((0 until nBands).map { b =>
          // band b = bits [b*width, min((b+1)*width, nBits)); the mask
          // also clears bits smeared in by the ARITHMETIC shift when the
          // top hash bit is set
          val lo = b * width
          val w = math.min(width, nBits - lo)
          val mask = if (w >= 64) -1L else (1L << w) - 1
          (shiftright(col(hashCol), lo) bitwiseAND lit(mask))
        }: _*)
      ).as(Seq("band", "bh"))
    )
    val a = bands.as("a"); val b = bands.as("b")
    a.join(
      b,
      col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col(s"a.$idCol") < col(s"b.$idCol")
    )
      .select(
        col(s"a.$idCol").as("d1"),
        col(s"b.$idCol").as("d2"),
        bit_count(col("a.__h").bitwiseXOR(col("b.__h"))).cast("long").as("hamming")
      )
      // filter BEFORE distinct: hamming is deterministic per pair, so the
      // result is identical, but over-threshold band collisions (common —
      // near-miss buckets share a band by chance) never ride the
      // distinct's exchange
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Image near-duplicate pairs: pHash + banded-Hamming blocking (see
    * [[hammingDupes]]); per-row cost is one real decode + one 32-point
    * DCT. @return (d1, d2, hamming) with d1 < d2, hamming <= maxHamming. */
  def pHashDupes(df: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame =
    hammingDupes(imagePHashes(df, idCol), idCol, "phash", PHashBits, maxHamming)

  /** Mono samples in [-1, 1], at most `maxFrames` of them: PCM16 RIFF
    * fast path (same lock-free chunk walk as [[decodePcm16Riff]]), javax
    * conversion fallback for everything else. None for undecodable. */
  private[graft] def monoSamples(payload: Array[Byte], maxFrames: Int): Option[Array[Double]] = {
    if (payload == null) return None
    val p = payload
    val fast: Option[Array[Double]] =
      if (
        p.length < 44 ||
        p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
        p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E'
      ) None
      else {
        val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var off = 12
        var fmtCode = -1; var channels = -1; var bits = -1
        var dataOff = -1; var dataLen = -1
        while (off + 8 <= p.length && dataOff < 0) {
          val len = bb.getInt(off + 4)
          if (len < 0) return None
          val id = new String(p, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
          if (id == "fmt " && len >= 16 && off + 8 + 16 <= p.length) {
            fmtCode = bb.getShort(off + 8) & 0xffff
            channels = bb.getShort(off + 10) & 0xffff
            bits = bb.getShort(off + 22) & 0xffff
          } else if (id == "data") {
            dataOff = off + 8
            dataLen = math.min(len.toLong, (p.length - dataOff).toLong).toInt
          }
          if (len > p.length - off - 8) off = p.length
          else off += 8 + len + (len & 1)
        }
        if (fmtCode != 1 || bits != 16 || channels < 1 || dataOff < 0) None
        else {
          val frameBytes = channels * 2
          val n = math.min((dataLen / frameBytes).toLong, maxFrames.toLong).toInt
          val out = new Array[Double](n)
          var f = 0; var o = dataOff
          while (f < n) {
            var acc = 0L; var c = 0
            while (c < channels) { acc += bb.getShort(o + 2 * c); c += 1 }
            out(f) = acc.toDouble / channels / 32768.0
            f += 1; o += frameBytes
          }
          Some(out)
        }
      }
    fast.orElse {
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(p)
        )
        val fmt = in.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, fmt.getChannels, fmt.getChannels * 2, fmt.getSampleRate, false
        )
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        val ch = fmt.getChannels
        val frameBytes = ch * 2
        val buf = new Array[Byte](frameBytes * maxFrames)
        var read = 0; var r = 0
        while (read < buf.length && { r = pcm.read(buf, read, buf.length - read); r > 0 })
          read += r
        val n = read / frameBytes
        val bb2 = java.nio.ByteBuffer.wrap(buf).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val out = new Array[Double](n)
        var f = 0
        while (f < n) {
          var acc = 0L; var c = 0
          while (c < ch) { acc += bb2.getShort(f * frameBytes + 2 * c); c += 1 }
          out(f) = acc.toDouble / ch / 32768.0
          f += 1
        }
        Some(out)
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** splitmix64 finisher — a REAL avalanche. `(seed * K) >>> 33` is NOT
    * one: the high bits of a product are linear in the seed (≈ seed *
    * K/2^33), so "hashed" sequences over nearby seeds are arithmetic
    * progressions — measured 0.91 correlation between two synth patterns'
    * envelopes and 8k cross-pattern fingerprint collisions before this. */
  private[graft] def mix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val AfpWindow = 1024 // samples per window
  private val AfpBands = 8 // sub-windows per window
  private val AfpWindows = 9 // windows hashed -> 8 transitions x 8 bands = 64 bits

  /** 64-bit audio fingerprint: 9 windows of 1024 mono samples, 8 band
    * energies per window, bit = "this band's energy ROSE vs the previous
    * window". Energy RATIOS make the bits invariant to volume scaling and
    * bit-depth rounding; only the clip's HEAD is hashed, so trailing
    * silence or truncation past ~9k samples does not change the
    * fingerprint. None for undecodable or too-short (< 2 windows) clips. */
  def audioFingerprint(payload: Array[Byte]): Option[Long] =
    monoSamples(payload, AfpWindow * AfpWindows).flatMap { s =>
      val nWin = s.length / AfpWindow
      if (nWin < 2) None
      else {
        val bandLen = AfpWindow / AfpBands
        val e = Array.ofDim[Double](nWin, AfpBands)
        var w = 0
        while (w < nWin) {
          var b = 0
          while (b < AfpBands) {
            var acc = 0.0
            var i = 0
            val base = w * AfpWindow + b * bandLen
            while (i < bandLen) { val x = s(base + i); acc += x * x; i += 1 }
            e(w)(b) = acc
            b += 1
          }
          w += 1
        }
        var bits = 0L
        w = 1
        while (w < nWin) {
          var b = 0
          while (b < AfpBands) {
            if (e(w)(b) > e(w - 1)(b)) bits |= (1L << ((w - 1) * AfpBands + b))
            b += 1
          }
          w += 1
        }
        Some(bits)
      }
    }

  /** (id, afp) via partition-preserving decode; undecodable/too-short
    * rows drop. */
  def audioFingerprints(df: DataFrame, idCol: String): DataFrame =
    hashProjection(df, idCol, "afp")(audioFingerprint)

  /** Audio near-duplicate pairs: fingerprint + banded-Hamming blocking
    * (see [[hammingDupes]]) over the 64 fingerprint bits.
    * @return (d1, d2, hamming) with d1 < d2, hamming <= maxHamming. */
  def audioFpDupes(df: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame =
    hammingDupes(audioFingerprints(df, idCol), idCol, "afp", 64, maxHamming)

  /** (id, frame_idx, phash) for every `every`-th REAL-decoded video
    * frame: AVI/MJPEG container walk + JPEG decode + DCT pHash per
    * sampled frame; corrupt payloads and undecodable frames contribute
    * no rows. Partition-preserving fan-out, like [[sampleVideoFrames]]. */
  def videoPHashes(df: DataFrame, idCol: String, every: Int): DataFrame = {
    val frames = sampleVideoFrames(df, idCol, every)
    val schema = StructType(
      Seq(
        StructField(idCol, frames.schema(idCol).dataType),
        StructField("frame_idx", IntegerType),
        StructField("phash", LongType)
      )
    )
    val idIdx = frames.schema.fieldIndex(idCol)
    val fiIdx = frames.schema.fieldIndex("frame_idx")
    val frIdx = frames.schema.fieldIndex("frame")
    frames.mapPartitions { rows =>
      rows.flatMap { r =>
        imagePHash(r.getAs[Array[Byte]](frIdx))
          .map(h => Row(r.get(idIdx), r.getInt(fiIdx), h))
      }
    }(Encoders.row(schema))
  }

  /** Video near-duplicate pairs: per-frame pHashes matched across videos
    * via the banded-Hamming blocking, then videos pair when at least
    * `minMatches` DISTINCT sampled frames of the lower-id video match
    * SOME frame of the other (frame-index-free matching, so trims and
    * offsets still pair). Ids pack as `doc * 2^20 + frame_idx` through
    * the shared [[hammingDupes]] — doc-major, so the pair order is by
    * doc id; same-doc frame matches are dropped.
    *
    * @return (d1, d2, n_match) with d1 < d2, n_match >= minMatches. */
  def videoDupes(
      df: DataFrame,
      idCol: String,
      every: Int = 2,
      maxHamming: Int = 3,
      minMatches: Int = 2
  ): DataFrame = {
    require(minMatches >= 1, s"videoDupes: minMatches must be >= 1, got $minMatches")
    require(
      Seq(LongType, IntegerType).contains(df.schema(idCol).dataType),
      s"videoDupes: id column '$idCol' must be integral (got ${df.schema(idCol).dataType}) — " +
        "ids pack into the frame-hash key"
    )
    // a frame index past the 2^20 packing slot would silently collide
    // into the NEXT doc's frame space — raise loudly instead (sample more
    // sparsely via `every` for multi-hour clips). Negative doc ids break
    // the unpack too (`div` truncates toward zero while pmod wraps), so
    // they raise the same way
    val fid = when(
      col("frame_idx") >= 1048576,
      raise_error(lit("videoDupes: frame_idx >= 2^20 — increase `every`")).cast("long")
    ).when(
      col(idCol) < 0,
      raise_error(lit("videoDupes: negative doc id breaks the 2^20 id*frame packing")).cast("long")
    ).otherwise(col(idCol).cast("long") * 1048576L + col("frame_idx"))
    val hashes = videoPHashes(df, idCol, every)
      .select(fid.as("fid"), col("phash"))
    hammingDupes(hashes, "fid", "phash", PHashBits, maxHamming)
      .select(
        expr("d1 div 1048576").as("da"), // div, not `/`: Column `/` is double division
        pmod(col("d1"), lit(1048576L)).as("fa"),
        expr("d2 div 1048576").as("db")
      )
      .filter(col("da") =!= col("db"))
      .groupBy(col("da").as("d1"), col("db").as("d2"))
      .agg(countDistinct(col("fa")).as("n_match"))
      .filter(col("n_match") >= minMatches)
  }

  /** Synthetic patterned AVI payloads for the video-dedup pipeline:
    * mix64-textured frames keyed by `(pattern, frame)`, while JPEG
    * quality and frame size vary per id — same-pattern docs are true
    * near-duplicate videos (different bytes, same content). Frame count
    * varies with the pattern so clip length is not a trivial key. */
  def withSynthAviVariantPayload(in: DataFrame, idCol: String, patternCol: String): DataFrame = {
    val df = widen(in)
    val schema = StructType(
      Seq(StructField(idCol, df.schema(idCol).dataType), StructField("payload", BinaryType))
    )
    val idIdx = df.schema.fieldIndex(idCol)
    val patIdx = df.schema.fieldIndex(patternCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = idLong(r.get(idIdx), "id")
        val p = idLong(r.get(patIdx), "pattern")
        val scale = 1 + (id % 2).toInt
        val w = 64 * scale; val h = 48 * scale
        val n = 4 + (p % 3).toInt
        val jpegs = (0 until n).map { fi =>
          val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          fillBlockTexture(img, w, h, scale, (bx, by) =>
            ((mix64(p * 1000003L + fi * 999983L + bx * 7919L + by * 104729L) >>> 33) % 256).toInt)
          encodeJpeg(img, 0.7f + 0.1f * (id % 3))
        }
        Row(r.get(idIdx), encodeAviMjpeg(jpegs, w, h, 10))
      }
    }(Encoders.row(schema))
  }

  /** Synthetic WAV payloads for the fingerprint pipeline: the per-window
    * energy envelope is a pure function of `pattern` (LCG avalanche),
    * while AMPLITUDE and tail length vary per id — same-pattern docs are
    * true near-duplicates (different bytes, different volume, same
    * content head), exactly what energy-ratio fingerprinting is for. */
  def withSynthWavVariantPayload(in: DataFrame, idCol: String, patternCol: String): DataFrame = {
    val df = widen(in)
    val schema = StructType(
      Seq(StructField(idCol, df.schema(idCol).dataType), StructField("payload", BinaryType))
    )
    val idIdx = df.schema.fieldIndex(idCol)
    val patIdx = df.schema.fieldIndex(patternCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = idLong(r.get(idIdx), "id")
        val p = idLong(r.get(patIdx), "pattern")
        val amp = 0.3 + 0.25 * (id % 3) // volume varies per id
        val n = AfpWindow * AfpWindows + (id % 3).toInt * 512 // tail varies too
        val samples = new Array[Short](n)
        var t = 0
        while (t < n) {
          val w = t / AfpWindow
          val b = (t % AfpWindow) / (AfpWindow / AfpBands)
          // per-(pattern, window, BAND) level in [0.2, 1] — per-band
          // variation is what gives each of the 64 fingerprint bits its
          // own coin; a window-only envelope collapses all 8 band bits of
          // a transition into one (measured: 30k cross-pattern hamming-0
          // collisions on the 500-doc corpus). mix64, not a bare LCG —
          // see [[mix64]] for the measured failure of high-product bits.
          val lvl = 0.2 + 0.8 * ((mix64(p * 1000003L + w * 7919L + b * 104729L) >>> 33) % 1024) / 1023.0
          // pattern-independent texture, pure function of t
          val tx = (((t.toLong * 2654435761L + 11L) >>> 20) % 2048) / 1023.5 - 1.0
          samples(t) = (amp * lvl * tx * 32767.0).toShort
          t += 1
        }
        Row(r.get(idIdx), wavBytes(samples))
      }
    }(Encoders.row(schema))
  }

  /** Synthetic patterned JPEG payloads for the pHash pipeline: the stripe
    * pattern is a pure function of `pattern`, while size and encoder
    * quality vary per id — so same-pattern docs are true NEAR-duplicates
    * (different bytes, same image content), the case byte-hash dedup
    * cannot see. */
  def withSynthJpegPayload(in: DataFrame, idCol: String, patternCol: String): DataFrame = {
    val df = widen(in)
    val schema = StructType(
      Seq(StructField(idCol, df.schema(idCol).dataType), StructField("payload", BinaryType))
    )
    val idIdx = df.schema.fieldIndex(idCol)
    val patIdx = df.schema.fieldIndex(patternCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = idLong(r.get(idIdx), "id")
        val p = idLong(r.get(patIdx), "pattern")
        val scale = 1 + (id % 3).toInt // 64x48, 128x96, 192x144
        val w = 64 * scale; val h = 48 * scale
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        // pseudo-random 4x4-px block texture, pure function of the
        // pattern key: rich content across frequencies (a gradient or
        // periodic checker concentrates the DCT in a few coefficients
        // and leaves the rest as fragile sign-noise). mix64 avalanche so
        // different pattern keys give UNCORRELATED textures (a bare xor
        // of key multiples is a per-value remap — structurally similar
        // images, measured cross-hamming 8; a bare LCG's high product
        // bits are linear in the seed)
        fillBlockTexture(img, w, h, scale, (bx, by) =>
          ((mix64(p * 1000003L + bx * 7919L + by * 104729L) >>> 33) % 256).toInt)
        Row(r.get(idIdx), encodeJpeg(img, 0.7f + 0.1f * (id % 3))) // quality varies per id
      }
    }(Encoders.row(schema))
  }
}
