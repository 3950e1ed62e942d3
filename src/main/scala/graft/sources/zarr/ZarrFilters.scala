package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** numcodecs FILTER chain support (the `.zarray` `filters` list — applied
  * before the compressor at write time, reversed after decompression at
  * read time). A reader that ignores this list returns wrong values
  * silently, so unknown filters are REJECTED with a clear error rather
  * than skipped.
  *
  * Supported:
  *  - `delta` (numcodecs.Delta with astype == dtype): decode is a prefix
  *    sum in the stored type's own width/arithmetic (ints wrap, floats add
  *    in their own precision — bit-faithful to numpy's cumsum)
  *  - `quantize` / `bitround`: LOSSY AT ENCODE only — stored values are
  *    already final, decode is the identity
  *
  * `astype != dtype` re-types the stored bytes (different chunk byte
  * length); rejected with an explicit message until a store needing it
  * shows up. */
object ZarrFilters {
  implicit private val formats: Formats = DefaultFormats

  def idOf(cfg: String): String = (JsonMethods.parse(cfg) \ "id").extract[String]

  /** Decode one filter IN PLACE over the chunk bytes (called in reverse
    * encode order by the chunk reader); returns the same array. */
  def decode(cfg: String, dt: ZDtype, bytes: Array[Byte]): Array[Byte] = idOf(cfg) match {
    case "delta" =>
      requireSameType(cfg, dt)
      deltaDecode(dt, bytes)
      bytes
    case "quantize" | "bitround" => bytes
    case other =>
      throw new UnsupportedOperationException(
        s"zarr filter '$other' not supported (supported: delta, quantize, bitround; " +
          "fixedscaleoffset/packbits/categorize/astype-retyping are not) — refusing to " +
          "skip it because that would silently return wrong values"
      )
  }

  /** Encode for the fixture writer: same ids, forward direction. */
  def encode(cfg: String, dt: ZDtype, bytes: Array[Byte]): Array[Byte] = idOf(cfg) match {
    case "delta" =>
      requireSameType(cfg, dt)
      deltaEncode(dt, bytes)
      bytes
    case "quantize" | "bitround" => bytes // fixtures hold already-quantized values
    case other => throw new UnsupportedOperationException(s"zarr filter '$other' not supported for write")
  }

  private def requireSameType(cfg: String, dt: ZDtype): Unit = {
    val j = JsonMethods.parse(cfg)
    val astype = (j \ "astype").extractOpt[String]
    val dtype = (j \ "dtype").extractOpt[String]
    val retyped = astype.exists(a => dtype.exists(d => ZDtype.parse(a) != ZDtype.parse(d))) ||
      astype.exists(a => ZDtype.parse(a).code != dt.code || ZDtype.parse(a).itemSize != dt.itemSize)
    if (retyped)
      throw new UnsupportedOperationException(
        s"zarr delta filter with astype != dtype ($cfg) not supported — stored chunk bytes " +
          "would be a different width than the array dtype"
      )
  }

  private def buf(dt: ZDtype, bytes: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(bytes).order(if (dt.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)

  /** Prefix sum in the stored type (numpy cumsum semantics: integer
    * wrap-around in the stored width, float addition in float precision). */
  private def deltaDecode(dt: ZDtype, bytes: Array[Byte]): Unit = {
    val bb = buf(dt, bytes)
    val n = bytes.length / dt.itemSize
    dt.code match {
      case ZDtype.I1 | ZDtype.U1 =>
        var acc: Byte = 0
        var i = 0
        while (i < n) { acc = (acc + bytes(i)).toByte; bytes(i) = acc; i += 1 }
      case ZDtype.I2 | ZDtype.U2 =>
        var acc: Short = 0
        var i = 0
        while (i < n) { acc = (acc + bb.getShort(i * 2)).toShort; bb.putShort(i * 2, acc); i += 1 }
      case ZDtype.I4 | ZDtype.U4 =>
        var acc = 0
        var i = 0
        while (i < n) { acc += bb.getInt(i * 4); bb.putInt(i * 4, acc); i += 1 }
      case ZDtype.I8 | ZDtype.M8 =>
        var acc = 0L
        var i = 0
        while (i < n) { acc += bb.getLong(i * 8); bb.putLong(i * 8, acc); i += 1 }
      case ZDtype.F2 =>
        var acc = 0.0f
        var i = 0
        while (i < n) {
          acc += ZDtype.halfToFloat(bb.getShort(i * 2))
          bb.putShort(i * 2, ZDtype.floatToHalf(acc))
          i += 1
        }
      case ZDtype.F4 =>
        var acc = 0.0f
        var i = 0
        while (i < n) { acc += bb.getFloat(i * 4); bb.putFloat(i * 4, acc); i += 1 }
      case ZDtype.F8 =>
        var acc = 0.0
        var i = 0
        while (i < n) { acc += bb.getDouble(i * 8); bb.putDouble(i * 8, acc); i += 1 }
      case other =>
        throw new UnsupportedOperationException(s"zarr delta filter unsupported for dtype ${dt.tag}")
    }
  }

  private def deltaEncode(dt: ZDtype, bytes: Array[Byte]): Unit = {
    val bb = buf(dt, bytes)
    val n = bytes.length / dt.itemSize
    dt.code match {
      case ZDtype.I1 | ZDtype.U1 =>
        var prev: Byte = 0
        var i = 0
        while (i < n) { val v = bytes(i); bytes(i) = (v - prev).toByte; prev = v; i += 1 }
      case ZDtype.I2 | ZDtype.U2 =>
        var prev: Short = 0
        var i = 0
        while (i < n) { val v = bb.getShort(i * 2); bb.putShort(i * 2, (v - prev).toShort); prev = v; i += 1 }
      case ZDtype.I4 | ZDtype.U4 =>
        var prev = 0
        var i = 0
        while (i < n) { val v = bb.getInt(i * 4); bb.putInt(i * 4, v - prev); prev = v; i += 1 }
      case ZDtype.I8 | ZDtype.M8 =>
        var prev = 0L
        var i = 0
        while (i < n) { val v = bb.getLong(i * 8); bb.putLong(i * 8, v - prev); prev = v; i += 1 }
      case ZDtype.F2 =>
        var prev = 0.0f
        var i = 0
        while (i < n) {
          val v = ZDtype.halfToFloat(bb.getShort(i * 2))
          bb.putShort(i * 2, ZDtype.floatToHalf(v - prev))
          prev = v
          i += 1
        }
      case ZDtype.F4 =>
        var prev = 0.0f
        var i = 0
        while (i < n) { val v = bb.getFloat(i * 4); bb.putFloat(i * 4, v - prev); prev = v; i += 1 }
      case ZDtype.F8 =>
        var prev = 0.0
        var i = 0
        while (i < n) { val v = bb.getDouble(i * 8); bb.putDouble(i * 8, v - prev); prev = v; i += 1 }
      case other =>
        throw new UnsupportedOperationException(s"zarr delta filter unsupported for dtype ${dt.tag}")
    }
  }
}
