package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal column plumbing (BASELINE north star): media as opaque
  * `binary` columns with typed metadata structs, decoded/featurized in
  * batched per-partition passes.
  *
  * The container ships no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic FAKE — but everything Spark-side is real and
  * tested: the (media binary, meta struct) schema, partition-parallel
  * `mapPartitions` execution with iterator batching (the JVM analogue of a
  * vectorized batch UDF: one buffer allocation per batch, not per row), and
  * the typed feature output that downstream joins/ANN consume.
  *
  * 100 TB notes: media bytes never shuffle — featurization is a narrow map
  * over the scan; only the small (id, features) projection flows onward.
  * Real lakes additionally store media OUT of line (object-store URIs +
  * byte ranges) so the scan reads metadata only until decode time.
  */
object MultimodalOps {

  case class MediaRow(doc_id: Long, media: Array[Byte], format: String,
      width: Int, height: Int)

  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
      byte_mean: Double, phash: Long)

  /** Media metadata schema — the typed struct that rides beside the blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Synthesize a media table from `documents`: text bytes stand in for
    * image payloads (deterministic; real ingest would read files/objects).
    * Metadata derives arithmetically from doc_id so tests can predict it.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        when(col("doc_id") % 2 === 0, "png").otherwise("jpeg").as("format"),
        (lit(64) + (col("doc_id") % 192)).cast(IntegerType).as("width"),
        (lit(64) + (col("doc_id") % 128)).cast(IntegerType).as("height")).as("meta"))
  }

  /** STUB — deterministic fake decode/feature-extract. A real deployment
    * replaces the body with an image codec (e.g. TwelveMonkeys/JavaCV) —
    * the signature (bytes in, features out) and everything around it stay.
    */
  private[operators] def decodeStub(media: Array[Byte]): (Double, Long) = {
    var sum = 0L
    var h = 1125899906842597L // FNV-ish rolling hash as a stand-in pHash
    var i = 0
    while (i < media.length) {
      sum += media(i) & 0xff
      h = h * 31 + (media(i) & 0xff)
      i += 1
    }
    (if (media.length == 0) 0.0 else sum.toDouble / media.length, h)
  }

  /** Partition-parallel featurization with iterator batching: each partition
    * is consumed in fixed-size batches (the "batch shape" a vectorized UDF
    * would see), each batch decoded tightly, results streamed out lazily —
    * constant memory per task regardless of partition size.
    */
  def featurize(spark: SparkSession, sfDir: String, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    val media = mediaTable(spark, sfDir).select(
      col("doc_id"),
      col("media"),
      col("meta.format").as("format"),
      col("meta.width").as("width"),
      col("meta.height").as("height")).as[MediaRow]
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val (mean, hash) = decodeStub(r.media)
          MediaFeatures(r.doc_id, r.format, r.media.length.toLong, mean, hash)
        }
      }
    }
  }

  /** Declared query: featurized media stats per format. `mapPartitions` has
    * no SQL equivalent → rows-only driver check; MultimodalSpec asserts the
    * numbers in-process.
    */
  def mediaFeatureStats(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = featurize(spark, sfDir)
    feats.groupBy(col("format"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("byte_mean")), 6).as("avg_byte_mean"),
        countDistinct(col("phash")).as("n_distinct_phash"))
      .orderBy(col("format"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_feature_stats" -> (mediaFeatureStats(_, _))
  )

  /** mapPartitions featurization is not SQL-expressible — rows-only check. */
  def oracleSql: Map[String, String] = Map.empty
}
