package graft.sources.zarr

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, DeflaterOutputStream, GZIPInputStream, GZIPOutputStream, InflaterInputStream}

/** Chunk compression seam. `zlib`/`gzip` round-trip through `java.util.zip`,
  * `zstd` through zstd-jni, and `blosc` — numcodecs' DEFAULT compressor, used
  * by virtually every real-world Zarr v2 store (the reference's fixtures are
  * zarr defaults, reference: tests/conftest.py:17-49) — through [[Blosc]],
  * which parses the 16-byte blosc1 frame and dispatches the inner codec to
  * the lz4-java / zstd-jni / snappy-java / java.util.zip libraries Spark
  * already ships. Adding another codec only touches this object. */
object ZarrCodec {
  def decompress(codec: Option[String], bytes: Array[Byte], rawLen: Int): Array[Byte] =
    codec match {
      case None => bytes
      case Some("zlib") => readAll(new InflaterInputStream(new java.io.ByteArrayInputStream(bytes)), rawLen)
      case Some("gzip") => readAll(new GZIPInputStream(new java.io.ByteArrayInputStream(bytes)), rawLen)
      case Some("zstd") =>
        // rawLen is known from the chunk's element count x item size; a
        // one-shot decompress avoids streaming allocation churn
        com.github.luben.zstd.Zstd.decompress(bytes, rawLen)
      case Some("blosc") => Blosc.decompress(bytes)
      case Some(other) =>
        throw new UnsupportedOperationException(
          s"zarr codec '$other' not supported on JVM (supported: blosc, zlib, gzip, zstd, uncompressed)"
        )
    }

  /** `codec` for write: "zlib" | "gzip" | "zstd" | "blosc[:cname[:noshuffle]]"
    * (blosc cname ∈ lz4, zstd, zlib, snappy; byte-shuffle on by default to
    * match numcodecs' zarr default `Blosc(cname='lz4', shuffle=SHUFFLE)`).
    * `typesize` drives the blosc shuffle filter; other codecs ignore it. */
  def compress(codec: Option[String], bytes: Array[Byte], typesize: Int = 1): Array[Byte] = codec match {
    case None => bytes
    case Some("zlib") =>
      val bos = new ByteArrayOutputStream()
      val d = new DeflaterOutputStream(bos, new Deflater(Deflater.DEFAULT_COMPRESSION))
      d.write(bytes); d.close(); bos.toByteArray
    case Some("gzip") =>
      val bos = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(bos)
      g.write(bytes); g.close(); bos.toByteArray
    case Some("zstd") => com.github.luben.zstd.Zstd.compress(bytes, 3)
    case Some(b) if b == "blosc" || b.startsWith("blosc:") =>
      val parts = b.split(":")
      val cname = if (parts.length > 1) parts(1) else "lz4"
      val shuffle = !(parts.length > 2 && parts(2) == "noshuffle")
      Blosc.compress(cname, bytes, typesize, shuffle)
    case Some(other) =>
      throw new UnsupportedOperationException(s"zarr codec '$other' not supported for write")
  }

  private def readAll(in: java.io.InputStream, expect: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(math.max(64, expect))
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }
}

/** Blosc1 frame codec (the container numcodecs' `Blosc` writes).
  *
  * Frame layout (c-blosc 1.x `blosc.c`, public BSD source):
  * {{{
  *  byte 0    version (2)
  *  byte 1    inner-codec format version
  *  byte 2    flags: 0x1 byte-shuffle | 0x2 memcpy | 0x4 bit-shuffle,
  *            bits 5-7 inner codec (0 blosclz, 1 lz4, 2 snappy, 3 zlib, 4 zstd)
  *  byte 3    typesize
  *  int32 LE  nbytes (uncompressed), blocksize, cbytes (frame incl. header)
  *  then      int32 LE block start offsets (absolute), one per block
  *            — absent in memcpy mode, where raw bytes follow the header
  *  blocks    each block: per split, int32 LE compressed size + payload;
  *            a split whose size equals its uncompressed size is stored raw
  * }}}
  *
  * Splits: full blocks of a splittable frame (inner codec blosclz/lz4,
  * 2 <= typesize <= 16, blocksize % typesize == 0 — c-blosc's
  * forward-compat split policy) hold one compressed stream per byte lane;
  * other blocks hold a single stream. Because older c-blosc versions
  * applied a different policy (split for every codec), decode verifies the
  * split streams land exactly on the block boundary and falls back to the
  * other split count if not — both layouts decode.
  *
  * Byte-shuffle is applied per block (shuffle -> compress; decompress ->
  * unshuffle). Bit-shuffle (numcodecs shuffle=2) is rejected with a clear
  * error. blosclz payloads are rejected: it is blosc's own LZ77 format with
  * no JVM implementation (numcodecs' zarr default is lz4, which is covered).
  */
object Blosc {
  private val FlagShuffle = 0x1
  private val FlagMemcpy = 0x2
  private val FlagBitShuffle = 0x4
  private val MaxStreams = 16

  private val lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance()

  def decompress(frame: Array[Byte]): Array[Byte] = {
    require(frame.length >= 16, s"truncated blosc frame (${frame.length} bytes)")
    val bb = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
    val flags = bb.get(2) & 0xff
    val typesize = bb.get(3) & 0xff
    val nbytes = bb.getInt(4)
    val blocksize = bb.getInt(8)
    require(nbytes >= 0 && blocksize > 0 || nbytes == 0, s"bad blosc frame: nbytes=$nbytes blocksize=$blocksize")
    val out = new Array[Byte](nbytes)
    if (nbytes == 0) return out
    if ((flags & FlagMemcpy) != 0) {
      System.arraycopy(frame, 16, out, 0, nbytes)
      return out
    }
    require((flags & FlagBitShuffle) == 0, "blosc bit-shuffle filter not supported (byte-shuffle is)")
    val codec = (flags >> 5) & 0x7
    val shuffled = (flags & FlagShuffle) != 0 && typesize > 1
    val nblocks = ((nbytes.toLong + blocksize - 1) / blocksize).toInt
    val bstarts = Array.tabulate(nblocks)(i => bb.getInt(16 + 4 * i))
    val tmp = if (shuffled) new Array[Byte](blocksize) else null
    var b = 0
    while (b < nblocks) {
      val bsize = math.min(blocksize.toLong, nbytes.toLong - b.toLong * blocksize).toInt
      val leftover = bsize != blocksize
      val blockEnd = if (b + 1 < nblocks) bstarts(b + 1) else frame.length
      val target = if (shuffled) tmp else out
      val targetOff = if (shuffled) 0 else b * blocksize
      val primary = if (!leftover && splitPolicy(codec, typesize, blocksize)) typesize else 1
      val ok = tryDecodeBlock(frame, bstarts(b), blockEnd, codec, primary, bsize, target, targetOff) || {
        // other split layout (older c-blosc always split when splittable)
        val alt = if (primary == 1 && !leftover && typesize >= 2 && typesize <= MaxStreams &&
          blocksize % typesize == 0) typesize else 1
        alt != primary && tryDecodeBlock(frame, bstarts(b), blockEnd, codec, alt, bsize, target, targetOff)
      }
      require(ok, s"blosc block $b failed to decode (codec=$codec typesize=$typesize)")
      if (shuffled) unshuffle(typesize, tmp, bsize, out, b * blocksize)
      b += 1
    }
    out
  }

  /** c-blosc forward-compat split policy — pure over header fields, so
    * decode recomputes what compress decided. */
  private def splitPolicy(codec: Int, typesize: Int, blocksize: Int): Boolean =
    (codec == 0 || codec == 1) && typesize >= 2 && typesize <= MaxStreams &&
      blocksize % typesize == 0

  /** Decode one block as `nsplits` concatenated streams; false if the
    * streams don't land exactly on the block end (wrong split guess). */
  private def tryDecodeBlock(
      frame: Array[Byte],
      start: Int,
      end: Int,
      codec: Int,
      nsplits: Int,
      bsize: Int,
      out: Array[Byte],
      outOff: Int
  ): Boolean =
    try {
      val neblock = bsize / nsplits
      if (neblock * nsplits != bsize) return false
      val bb = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
      var pos = start
      var s = 0
      while (s < nsplits) {
        if (pos + 4 > frame.length) return false
        val csize = bb.getInt(pos)
        pos += 4
        if (csize < 0 || pos + csize > frame.length) return false
        val dstOff = outOff + s * neblock
        if (csize == neblock) System.arraycopy(frame, pos, out, dstOff, neblock)
        else {
          val n = codec match {
            case 1 => lz4.safeDecompressor().decompress(frame, pos, csize, out, dstOff, neblock)
            case 2 =>
              val dec = org.xerial.snappy.Snappy.uncompress(java.util.Arrays.copyOfRange(frame, pos, pos + csize))
              System.arraycopy(dec, 0, out, dstOff, dec.length); dec.length
            case 3 =>
              val inf = new java.util.zip.Inflater()
              inf.setInput(frame, pos, csize)
              val n0 = inf.inflate(out, dstOff, neblock)
              inf.end(); n0
            case 4 =>
              com.github.luben.zstd.Zstd
                .decompressByteArray(out, dstOff, neblock, frame, pos, csize)
                .toInt
            case 0 =>
              throw new UnsupportedOperationException(
                "blosc inner codec 'blosclz' has no JVM implementation (supported: lz4, snappy, zlib, zstd)"
              )
            case other => throw new UnsupportedOperationException(s"unknown blosc inner codec id $other")
          }
          if (n != neblock) return false
        }
        pos += csize
        s += 1
      }
      pos == end
    } catch {
      case e: UnsupportedOperationException => throw e // unsupported codec, not a wrong split guess
      case scala.util.control.NonFatal(_) => false
    }

  /** Compress into a blosc1 frame readable by c-blosc/numcodecs.
    * `blockSize` 0 (default) = one block; any positive value exercises the
    * full multi-block + leftover-block layout (shuffle, splits, and the
    * raw-split escape all applied per block, exactly as decode walks it).
    * Property-tested round-trip across codecs/typesizes/block shapes. */
  def compress(
      cname: String,
      data: Array[Byte],
      typesize: Int,
      shuffle: Boolean,
      blockSize: Int = 0
  ): Array[Byte] = {
    val codec = cname match {
      case "lz4" => 1
      case "snappy" => 2
      case "zlib" => 3
      case "zstd" => 4
      case other => throw new UnsupportedOperationException(s"blosc compress: unsupported cname '$other'")
    }
    val nbytes = data.length
    val ts = math.max(1, typesize)
    val blocksize =
      if (blockSize > 0) math.max(blockSize, ts) else math.max(nbytes, ts)
    // c-blosc shuffles only complete elements; per-BLOCK shuffle requires
    // each full block to hold whole elements
    val doShuffle = shuffle && ts > 1 && blocksize % ts == 0 && nbytes % ts == 0
    val nblocks = if (nbytes == 0) 0 else ((nbytes.toLong + blocksize - 1) / blocksize).toInt
    val sizeBuf = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)

    def compressOne(src: Array[Byte], off: Int, len: Int): Array[Byte] = codec match {
      case 1 =>
        val c = lz4.fastCompressor()
        val outBuf = new Array[Byte](c.maxCompressedLength(len))
        val n = c.compress(src, off, len, outBuf, 0, outBuf.length)
        java.util.Arrays.copyOf(outBuf, n)
      case 2 => org.xerial.snappy.Snappy.compress(java.util.Arrays.copyOfRange(src, off, off + len))
      case 3 =>
        val bos = new ByteArrayOutputStream()
        val d = new DeflaterOutputStream(bos, new Deflater(5))
        d.write(src, off, len); d.close(); bos.toByteArray
      case 4 =>
        com.github.luben.zstd.Zstd.compress(java.util.Arrays.copyOfRange(src, off, off + len), 3)
    }

    val payload = new ByteArrayOutputStream()
    val bstarts = new Array[Int](nblocks)
    var b = 0
    while (b < nblocks) {
      bstarts(b) = 16 + 4 * nblocks + payload.size()
      val bsize = math.min(blocksize.toLong, nbytes.toLong - b.toLong * blocksize).toInt
      val leftover = bsize != blocksize
      val blockOff = b * blocksize
      val block =
        if (doShuffle) {
          val t = new Array[Byte](bsize)
          shuffleBytes(ts, java.util.Arrays.copyOfRange(data, blockOff, blockOff + bsize), t)
          t
        } else java.util.Arrays.copyOfRange(data, blockOff, blockOff + bsize)
      val nsplits = if (!leftover && splitPolicy(codec, ts, blocksize)) ts else 1
      val neblock = bsize / nsplits
      var s = 0
      while (s < nsplits) {
        val comp = compressOne(block, s * neblock, neblock)
        val stored =
          if (comp.length >= neblock)
            java.util.Arrays.copyOfRange(block, s * neblock, s * neblock + neblock)
          else comp
        sizeBuf.clear(); sizeBuf.putInt(stored.length)
        payload.write(sizeBuf.array(), 0, 4)
        payload.write(stored)
        s += 1
      }
      b += 1
    }
    val body = payload.toByteArray
    val compressedFits = 16 + 4 * nblocks + body.length < 16 + nbytes
    val header = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    header.put(0, 2.toByte) // blosc1 format version
    header.put(1, 1.toByte) // inner codec format version
    if (!compressedFits) {
      // memcpy mode: raw bytes follow the header
      header.put(2, FlagMemcpy.toByte)
      header.put(3, ts.toByte)
      header.putInt(4, nbytes); header.putInt(8, blocksize); header.putInt(12, 16 + nbytes)
      val out = new Array[Byte](16 + nbytes)
      System.arraycopy(header.array(), 0, out, 0, 16)
      System.arraycopy(data, 0, out, 16, nbytes) // memcpy frames are UNSHUFFLED
      out
    } else {
      val flags = (if (doShuffle) FlagShuffle else 0) | (codec << 5)
      header.put(2, flags.toByte)
      header.put(3, ts.toByte)
      header.putInt(4, nbytes); header.putInt(8, blocksize)
      header.putInt(12, 16 + 4 * nblocks + body.length)
      val out = new Array[Byte](16 + 4 * nblocks + body.length)
      System.arraycopy(header.array(), 0, out, 0, 16)
      val bs = ByteBuffer.allocate(4 * math.max(1, nblocks)).order(ByteOrder.LITTLE_ENDIAN)
      bstarts.foreach(bs.putInt)
      System.arraycopy(bs.array(), 0, out, 16, 4 * nblocks)
      System.arraycopy(body, 0, out, 16 + 4 * nblocks, body.length)
      out
    }
  }

  /** Byte-shuffle: gather byte lane j of every element contiguously.
    * Trailing bytes (len % typesize) are copied through unchanged. */
  private[zarr] def shuffleBytes(typesize: Int, src: Array[Byte], dst: Array[Byte]): Unit = {
    val len = src.length
    val nel = len / typesize
    var j = 0
    while (j < typesize) {
      var i = 0
      while (i < nel) { dst(j * nel + i) = src(i * typesize + j); i += 1 }
      j += 1
    }
    var t = nel * typesize
    while (t < len) { dst(t) = src(t); t += 1 }
  }

  /** Inverse of [[shuffleBytes]] over one block. */
  private[zarr] def unshuffle(typesize: Int, src: Array[Byte], bsize: Int, dst: Array[Byte], dstOff: Int): Unit = {
    val nel = bsize / typesize
    var j = 0
    while (j < typesize) {
      var i = 0
      while (i < nel) { dst(dstOff + i * typesize + j) = src(j * nel + i); i += 1 }
      j += 1
    }
    var t = nel * typesize
    while (t < bsize) { dst(dstOff + t) = src(t); t += 1 }
  }
}
