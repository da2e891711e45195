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

  /** Fail-fast schema checks shared by the blob consumers (mirrors
    * [[resizeFeatures]]'s up-front validation): the id must be an integral
    * type and the blob column must exist as binary. Returns a Row→Long id
    * getter so Integer and Long ids both work. */
  private def validateBlobInput(df: DataFrame, idCol: String): (Int, Int, Row => Long) = {
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex("blob")
    df.schema(blobIdx).dataType match {
      case BinaryType => ()
      case other => throw new IllegalArgumentException(
        s"Multimodal: blob column must be binary, got $other")
    }
    val getId: Row => Long = df.schema(idIdx).dataType match {
      case LongType => r => r.getLong(idIdx)
      case IntegerType => r => r.getInt(idIdx).toLong
      case other => throw new IllegalArgumentException(
        s"Multimodal: id column '$idCol' must be integral (int/bigint), got $other")
    }
    (idIdx, blobIdx, getId)
  }

  /** Null blobs error clearly (with the offending id) instead of NPEing
    * mid-task — attach blobs with [[withBlob]] or filter nulls upstream. */
  private def requireBlob(bytes: Array[Byte], id: Long): Array[Byte] = {
    if (bytes == null) throw new IllegalArgumentException(
      s"Multimodal: null blob for id=$id; filter null payloads upstream")
    bytes
  }

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
    val (_, blobIdx, getId) = validateBlobInput(blobs, idCol)
    blobs.mapPartitions { rows =>
      rows.map { r =>
        val id = getId(r)
        val bytes = requireBlob(r.getAs[Array[Byte]](blobIdx), id)
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

  /** Frame sampling over blobs: fixed-size windows at a fixed stride —
    * the video/audio frame-extraction shape (one row per sampled frame,
    * offset + length + a per-frame feature), partition-parallel.
    *
    * STUB decode as above: the per-frame "feature" is the byte mean; a
    * real pipeline would decode the window (video frame, audio chunk)
    * here. Frames start at offsets 0, stride, 2·stride… while the offset
    * is inside the payload; the tail frame may be short. */
  def sampleFrames(blobs: DataFrame, idCol: String,
      frameSize: Int = 64, stride: Int = 128): DataFrame = {
    require(frameSize > 0 && stride > 0)
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("frame_off", LongType, nullable = false),
      StructField("frame_len", LongType, nullable = false),
      StructField("frame_mean", DoubleType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val (_, blobIdx, getId) = validateBlobInput(blobs, idCol)
    blobs.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = getId(r)
        val bytes = requireBlob(r.getAs[Array[Byte]](blobIdx), id)
        Iterator.range(0, math.max(bytes.length, 1), stride).map { off =>
          val len = math.min(frameSize, bytes.length - off)
          var sum = 0L
          var i = off
          while (i < off + len) { sum += bytes(i) & 0xff; i += 1 }
          Row(id, (off / stride).toLong, off.toLong, len.toLong,
            sum.toDouble / math.max(len, 1))
        }
      }
    }(encoder)
  }

  /** Feature resize: re-bin an m-bucket feature vector to k buckets by
    * summing adjacent groups (m must be a multiple of k) — the cheap
    * "downsample the representation" stage between extract and model. */
  def resizeFeatures(features: DataFrame, featCol: String, k: Int): DataFrame = {
    require(k > 0)
    features.schema(featCol).dataType match {
      case ArrayType(DoubleType, _) => ()
      case other => throw new IllegalArgumentException(s"array<double> expected, got $other")
    }
    // fail fast (not silently drop elements) when m is not a multiple of k
    val checked = when(size(col(featCol)) % k === 0, col(featCol))
      .otherwise(raise_error(concat(
        lit(s"resizeFeatures: feature length "), size(col(featCol)).cast("string"),
        lit(s" is not a multiple of k=$k"))))
    features.withColumn(featCol,
      transform(
        sequence(lit(0), lit(k - 1)),
        g => aggregate(
          slice(checked, g * (size(checked) / k) + 1, size(checked) / k),
          lit(0.0), (acc, x) => acc + x)))
  }
}
