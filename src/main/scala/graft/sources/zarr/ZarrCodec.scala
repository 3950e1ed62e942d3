package graft.sources.zarr

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, DeflaterOutputStream, GZIPInputStream, GZIPOutputStream, InflaterInputStream}

/** Chunk compression seam. Zarr's default numcodecs blosc is not available
  * on the JVM; zlib/gzip round-trip through `java.util.zip`, zstd through
  * the zstd-jni library Spark already ships (numcodecs `zstd` writes plain
  * zstd frames, so the formats line up byte-for-byte). Adding another codec
  * (e.g. blosc via JNI) only touches this object. */
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
      case Some(other) =>
        throw new UnsupportedOperationException(
          s"zarr codec '$other' not supported on JVM (supported: zlib, gzip, zstd, uncompressed)"
        )
    }

  def compress(codec: Option[String], bytes: Array[Byte]): Array[Byte] = codec match {
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
