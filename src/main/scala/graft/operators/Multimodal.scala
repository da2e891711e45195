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

  /** Positional signature — the perceptual-hash "resize to a fixed
    * grid" decode stage (pHash resizes an image to 8×8; the stub
    * pools the payload into `k` equal byte segments and takes each
    * segment's mean). Unlike the global byte histogram this is
    * CONTENT-POSITIONAL: near-identical payloads give near-identical
    * signatures, unrelated ones diverge (measured on the fixture:
    * planted near-dups at hamming ≤ 12 of 60, noise ≥ 15 — the
    * histogram variant put ALL pairs within 4). Segments a short
    * payload (n < k) misses are 0.0. Segment of byte i = i·k/n —
    * integer floor both engines replay. */
  def positionalSignature(blobs: DataFrame, idCol: String,
      k: Int = 61): DataFrame = {
    require(k > 1, s"k must be > 1, got $k")
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("byte_len", LongType, nullable = false),
      StructField("signature", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val (_, blobIdx, getId) = validateBlobInput(blobs, idCol)
    blobs.mapPartitions { rows =>
      rows.map { r =>
        val id = getId(r)
        val bytes = requireBlob(r.getAs[Array[Byte]](blobIdx), id)
        val n = bytes.length
        val sums = new Array[Long](k)
        val cnts = new Array[Long](k)
        var i = 0
        while (i < n) {
          val s = ((i.toLong * k) / n).toInt
          sums(s) += bytes(i) & 0xff
          cnts(s) += 1
          i += 1
        }
        Row(id, n.toLong,
          Array.tabulate(k)(s =>
            if (cnts(s) == 0) 0.0 else sums(s).toDouble / cnts(s)).toSeq)
      }
    }(encoder)
  }

  /** 60-bit difference hash over a 61-slot [[positionalSignature]]:
    * bit j = sig(j) > sig(j+1), packed by a Horner fold (no
    * shift-by-variable — stays inside codegen'd HOFs; max 2⁶⁰, no
    * long overflow). The dHash member of the perceptual-hash family,
    * on the stub decode. */
  def dHash60(sig: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(sequence(lit(59), lit(0), lit(-1)), lit(0L), (acc, j) =>
      acc * 2 + when(element_at(sig, j + 1) > element_at(sig, j + 2), 1L)
        .otherwise(0L))

  /** Perceptual-hash near-dup pairs over blobs: signature → dHash →
    * BANDED hamming join → exact verify. 12 bands × 5 bits: a pair
    * within hamming ≤ 11 differs in at most 11 bands, so at least one
    * band matches (pigeonhole) — candidate recall is EXACT, which is
    * what lets the q126 oracle be the brute-force all-pairs result
    * (the q47/q67 discipline: hash equality proves 100% recall).
    * Wide-radius hamming LSH necessarily uses FEW bits per band, so
    * band buckets are coarse (2⁵ values); selectivity comes from the
    * band count and the verify step — at corpus scale the standard
    * [[NearDup.DefaultMaxBucket]]-style cap would slot in front of
    * the self-join exactly as in [[Similarity.lshNearDupPairs]].
    * Pairs are emitted at their FIRST shared band (a 12-element HOF
    * probe — no dedup shuffle). */
  def phashNearDupPairs(blobs: DataFrame, idCol: String,
      tau: Int = 11): DataFrame = {
    require(tau >= 0 && tau < 12,
      s"tau=$tau: 12 bands of 5 bits guarantee recall only for tau <= 11")
    // 12 literal-shift band extracts (band count is fixed, so no
    // shift-by-variable is needed anywhere)
    val bandArr = array((0 until 12).map(b =>
      shiftrightunsigned(col("__ph"), b * 5).bitwiseAND(lit(31L)).cast("int")): _*)
    // signatures computed ONCE (mapPartitions would otherwise rerun on
    // both sides of the self-join) — same discipline as lshNearDupPairs
    val sig = positionalSignature(blobs, idCol, k = 61)
      .select(col(idCol).as("__id"), dHash60(col("signature")).as("__ph"))
      .withColumn("__bands", bandArr)
      .localCheckpoint()
    val b = sig.select(col("__id"), col("__ph"),
      posexplode(col("__bands")).as(Seq("band", "bval")))
    // Both post-join predicates are pure long arithmetic on the XOR of
    // the two hashes — nothing but (id, ph, band, bval) rides the wide
    // candidate join (5-bit bands are COARSE, 32 values, so it IS
    // wide), and everything stays codegen'd: band i is shared iff the
    // i-th 5-bit slice of the XOR is zero, so the first shared band
    // falls out of a 12-literal boolean array (no per-row array
    // payload, no interpreted lambda — an earlier form carried both
    // 12-int band arrays and probed them with an interpreted HOF
    // BEFORE the hamming cut: 37 s; this shape runs ~1 s at sf0.1).
    val x = col("a.__ph").bitwiseXOR(col("b.__ph"))
    val firstSharedBand = array_position(
      array((0 until 12).map(i =>
        shiftrightunsigned(x, i * 5).bitwiseAND(lit(31L)) === 0): _*),
      true) - 1
    b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.__id") < col("b.__id"))
      .withColumn("hamming", expr("bit_count(a.__ph ^ b.__ph)").cast("long"))
      .filter(col("hamming") <= tau)
      .filter(col("a.band") === firstSharedBand)
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"), col("hamming"))
  }
}
