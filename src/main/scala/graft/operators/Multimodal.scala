package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video travel as opaque `binary`
  * payloads with typed metadata; decode / feature-extraction runs as a
  * per-partition batch transform.
  *
  * The actual media decode is STUBBED (no image/audio codecs in this
  * environment): [[fakeDecodeFeatures]] derives a deterministic feature
  * vector from the raw bytes so the Spark-side plumbing — schema, batch
  * shape, partition-wise execution, downstream joins — is real and tested,
  * and a production decoder (JNI codec, ONNX runtime, ...) can be swapped
  * into [[decodePartition]] without touching the plan.
  *
  * Scale design: payloads never pass through a shuffle wider than their
  * grouping key; feature extraction is `mapPartitions` (one decoder
  * instance per partition, batch-amortized), and metadata-only queries
  * never deserialize the payload column (Parquet column pruning).
  */
object Multimodal {

  /** Metadata struct accompanying every payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)
  ))

  val FeatureDims = 8

  /** Wrap a text/binary column as a multimodal payload with metadata —
    * pure column expressions, no UDF. */
  def withPayload(df: DataFrame, srcCol: String, mediaType: String): DataFrame =
    df
      .withColumn("payload", col(srcCol).cast(BinaryType))
      .withColumn("meta", struct(
        lit(mediaType).as("media_type"),
        octet_length(col("payload")).cast(LongType).as("n_bytes"),
        md5(col("payload")).as("checksum")))

  /** Deterministic stand-in for a media decoder: an `FeatureDims`-dim
    * feature vector from byte statistics of the payload. Replace with a
    * real decoder for production. */
  def fakeDecodeFeatures(payload: Array[Byte]): Array[Double] = {
    val out = new Array[Double](FeatureDims)
    var i = 0
    while (i < payload.length) {
      out(i % FeatureDims) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < FeatureDims) { out(j) /= math.max(1, payload.length / FeatureDims); j += 1 }
    }
    out
  }

  /** Partition-wise decode: one decoder instance per partition (the batch
    * shape a real codec/model runtime needs), emitting (id, features). */
  def decodePartition(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // a real implementation would initialize the decoder HERE, once
        rows.map { case (id, payload) => (id, fakeDecodeFeatures(payload)) }
      }
      .toDF("id", "features")
  }
}
