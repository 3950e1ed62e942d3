package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct. The Spark-side machinery
  * (schema, partition-preserving batch transform, feature schema) is real;
  * the codec itself is STUBBED behind `decodeStub` because no image/audio
  * libraries exist in this environment — swap `decodeStub` for a JNI/ffmpeg
  * call without touching the plumbing. */
object Multimodal {

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
    * feature schema, downstream aggregation) is exercised end-to-end. */
  def decodeStub(payload: Array[Byte]): Array[Float] =
    payload.map(b => ((b & 0xff).toFloat) / 256.0f)

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
}
