package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.C C4): opaque binary payloads
  * with typed metadata, processed partition-parallel.
  *
  * The decode step is a clearly-marked STUB — this container has no
  * image/audio codecs, so `extractFeatures` computes a deterministic fake
  * feature (a normalized byte histogram). Everything around it — binary
  * column handling, schema, partition-parallel `mapPartitions`, batch
  * shape — is the real plumbing a decode UDF would ride on at scale.
  */
object Multimodal {

  /** Attach an opaque blob column + metadata (here: utf-8 bytes of `text`
    * standing in for an image/audio payload). */
  def withBlob(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("blob"),
      octet_length(col(textCol)).cast("long").as("byte_len"),
      lit("text/plain").as("media_type"))

  /** Partition-parallel feature extraction over blobs.
    *
    * STUB: a real pipeline would decode the payload (image → pixels,
    * audio → samples) here; this computes a `bins`-bucket byte histogram,
    * normalized — deterministic and schema-identical to a real extractor's
    * `array<double>` features. */
  def extractFeatures(blobs: DataFrame, idCol: String, bins: Int = 16): DataFrame = {
    val spark = blobs.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("byte_len", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = blobs.schema.fieldIndex(idCol)
    val blobIdx = blobs.schema.fieldIndex("blob")
    blobs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val hist = new Array[Double](bins)
        var i = 0
        while (i < bytes.length) {
          hist(((bytes(i) & 0xff) * bins) / 256) += 1.0
          i += 1
        }
        val n = math.max(bytes.length, 1).toDouble
        Row(id, bytes.length.toLong, hist.map(_ / n).toSeq)
      }
    }(encoder)
  }
}
