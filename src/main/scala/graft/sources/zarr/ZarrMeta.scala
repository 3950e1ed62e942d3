package graft.sources.zarr

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Zarr v2 metadata model (public spec: zarr-specs v2; layout mirrored from
  * the reference's store handling, reference: src/data_access/zarr_storage.py:362-416).
  *
  * Supported subset: C order, little-endian dtypes i4/i8/f4/f8, compressors
  * `null`/`zlib`/`gzip`/`zstd`/`blosc` (the codec seam is [[ZarrCodec]];
  * unknown codecs are rejected with a clear error). Dimension names come from the xarray
  * `_ARRAY_DIMENSIONS` attribute with `dim_i` fallback (reference:
  * zarr_reader.py:303-305).
  */
final case class ZarrArrayMeta(
    name: String,
    shape: Vector[Int],
    chunks: Vector[Int],
    dtype: String,
    order: String,
    compressor: Option[String], // codec id
    fillValue: Option[Double],
    dims: Vector[String],
    attrs: Map[String, String]
) {
  def rank: Int = shape.length
  def valueType: DataType = ZarrMeta.sparkType(dtype)
  def nChunks: Vector[Int] =
    shape.zip(chunks).map { case (s, c) => if (s == 0) 0 else (s + c - 1) / c }
  def totalElements: Long = shape.map(_.toLong).product
}

object ZarrMeta {
  implicit val formats: Formats = DefaultFormats

  val SupportedDtypes: Map[String, DataType] = Map(
    "<i4" -> IntegerType,
    "<i8" -> LongType,
    "<f4" -> FloatType,
    "<f8" -> DoubleType
  )

  def sparkType(dtype: String): DataType =
    SupportedDtypes.getOrElse(
      dtype,
      throw new IllegalArgumentException(
        s"unsupported zarr dtype '$dtype' (supported: ${SupportedDtypes.keys.mkString(", ")})"
      )
    )

  def itemSize(dtype: String): Int = dtype match {
    case "<i4" | "<f4" => 4
    case "<i8" | "<f8" => 8
    case other => throw new IllegalArgumentException(s"unsupported zarr dtype '$other'")
  }

  /** Parse `.zarray` + optional `.zattrs` JSON into the meta model. */
  def parseArray(name: String, zarrayJson: String, zattrsJson: Option[String]): ZarrArrayMeta = {
    val j = JsonMethods.parse(zarrayJson)
    val shape = (j \ "shape").extract[List[Int]].toVector
    val chunks = (j \ "chunks").extract[List[Int]].toVector
    val dtype = (j \ "dtype").extract[String]
    val order = (j \ "order").extractOpt[String].getOrElse("C")
    require(order == "C", s"only C-order zarr arrays supported (array $name has order=$order)")
    val compressor = (j \ "compressor") match {
      case JNull | JNothing => None
      case c => Some((c \ "id").extract[String])
    }
    val fill = (j \ "fill_value") match {
      case JNull | JNothing => None
      case JString("NaN") => Some(Double.NaN)
      case JString("Infinity") => Some(Double.PositiveInfinity)
      case JString("-Infinity") => Some(Double.NegativeInfinity)
      case JDouble(x) => Some(x)
      case JInt(x) => Some(x.toDouble)
      case JLong(x) => Some(x.toDouble)
      case JDecimal(x) => Some(x.toDouble)
      case other => throw new IllegalArgumentException(s"unsupported fill_value $other")
    }
    val (dims, attrs) = zattrsJson match {
      case Some(a) =>
        val ja = JsonMethods.parse(a)
        // NB: json4s extractOpt[List[_]] turns JNothing into Some(Nil) — test
        // for absence explicitly
        val d = (ja \ "_ARRAY_DIMENSIONS") match {
          case JNothing | JNull => None
          case v => v.extractOpt[List[String]].map(_.toVector)
        }
        val rest = ja match {
          case JObject(fields) =>
            fields.collect {
              case (k, v) if k != "_ARRAY_DIMENSIONS" => k -> JsonMethods.compact(JsonMethods.render(v))
            }.toMap
          case _ => Map.empty[String, String]
        }
        (d, rest)
      case None => (None, Map.empty[String, String])
    }
    val dimNames = dims.getOrElse(shape.indices.map(i => s"dim_$i").toVector)
    require(
      dimNames.length == shape.length,
      s"array $name: _ARRAY_DIMENSIONS rank ${dimNames.length} != shape rank ${shape.length}"
    )
    ZarrArrayMeta(name, shape, chunks, dtype, order, compressor, fill, dimNames, attrs)
  }
}
