package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB ([[stubDecode]]) — everything around
  * it (schema, batched per-partition iteration, partitioning, output
  * shape) is the real Spark plumbing a codec would drop into: swap the
  * stub body for an actual decoder (e.g. javax.imageio / ffmpeg bindings)
  * and nothing else changes.
  *
  * Scale notes: binary payloads never pass through a shuffle here — all
  * operators are map-side; frame-sampling uses positional byte slices so
  * the full blob is read once per row; metadata lives in a separate
  * small struct column so metadata-only queries prune the blob column at
  * the Parquet reader (column pruning keeps 100 TB of media out of
  * metadata scans).
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Wrap a text/binary source column as an opaque media blob + typed
    * metadata. Deterministic fake width/height derived from content length
    * stand in for real codec-probed dimensions.
    */
  def asMedia(df: DataFrame, srcCol: String, mediaType: String): DataFrame = {
    val bin = encode(col(srcCol), "UTF-8")
    df.withColumn("media_bytes", bin)
      .withColumn("media_meta", struct(
        lit(mediaType).as("media_type"),
        (pmod(length(bin), lit(320)) + 64).cast("int").as("width"),
        (pmod(length(bin), lit(240)) + 48).cast("int").as("height"),
        length(bin).cast("long").as("n_bytes")))
  }

  /** Cheap per-blob features (codegen'd, no decode): byte length, content
    * digest, head-of-stream digest, and a sparse positional byte sample
    * ("frame sample" — every `stride`-th byte, up to `maxFrames`).
    */
  def blobFeatures(df: DataFrame, binCol: String, stride: Int = 50,
                   maxFrames: Int = 8): DataFrame = {
    val b = col(binCol)
    df.withColumn("n_bytes", length(b).cast("long"))
      .withColumn("content_md5", md5(b))
      .withColumn("head_md5", md5(substring(b, 1, 64)))
      .withColumn("frame_sample", transform(
        sequence(lit(0), least(lit(maxFrames - 1),
          greatest(floor((length(b) - 1) / stride).cast("int"), lit(0)))),
        i => hex(substring(b, i * stride + 1, lit(1)))))
  }

  /** STUB decode kernel — deterministic fake standing in for a real codec.
    *
    * Real implementation would decode `media_bytes` into pixel/sample
    * arrays per partition (one codec instance per partition, batched —
    * the same shape `mapInPandas` gives PySpark). The stub emits a
    * fixed-size "feature vector" derived from byte statistics so the
    * plumbing is testable end-to-end.
    */
  def stubDecode(df: DataFrame, features: Int = 8): DataFrame = {
    import df.sparkSession.implicits._
    val schema = StructType(df.schema.fields :+
      StructField("decoded_features", ArrayType(DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val binIdx = df.schema.fieldIndex("media_bytes")
    df.mapPartitions { rows =>
      // per-partition "codec" init happens here in a real implementation
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val feats: Array[Double] =
          if (bytes == null) Array.fill(features)(0.0)
          else (0 until features).map { f =>
            var acc = 0L
            var i = f
            while (i < bytes.length) { acc += (bytes(i) & 0xFF); i += features }
            acc.toDouble / math.max(1, (bytes.length + features - 1 - f) / features)
          }.toArray
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc).toDF(schema.fieldNames: _*)
  }

  /** "Resize": re-bucket the feature vector to `newSize` by averaging each
    * source bucket — the plumbing twin of an area-mean image resize.
    */
  def resizeFeatures(df: DataFrame, featCol: String, newSize: Int): DataFrame = {
    val f = col(featCol)
    df.withColumn(s"${featCol}_resized", transform(
      sequence(lit(0), lit(newSize - 1)), i => {
        val start = floor((i * size(f)).cast("double") / newSize).cast("int")
        val end = floor(((i + 1) * size(f)).cast("double") / newSize).cast("int")
        val len = greatest(end - start, lit(1))
        val bucket = slice(f, start + 1, len)
        aggregate(bucket, lit(0.0), (acc, x) => acc + x) / len
      }))
  }
}
