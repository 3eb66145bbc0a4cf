package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps

/** Multimodal plumbing: binary payload column + typed metadata struct,
  * batched mapPartitions featurization (decode stubbed deterministically —
  * no codecs in this container; the Spark-side schema/batching is real).
  */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  test("media table carries binary payload + typed metadata struct") {
    val media = MultimodalOps.mediaTable(spark, sf0001)
    val schema = media.schema
    assert(schema("media").dataType.typeName === "binary")
    // compare field names/types (nullability differs: literals are non-null)
    val metaFields = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields === MultimodalOps.mediaMetaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val row = media.orderBy("doc_id").limit(1).collect().head
    val text = Tables.documents(spark, sf0001).orderBy("doc_id")
      .limit(1).collect().head.getAs[String]("text")
    assert(new String(row.getAs[Array[Byte]]("media"), "UTF-8") === text)
  }

  test("featurize preserves cardinality and computes deterministic features") {
    val feats = MultimodalOps.featurize(spark, sf0001, batchSize = 7).cache()
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(feats.count() === nDocs)
    // n_bytes must equal the text byte length (ASCII corpus: n_chars)
    val mismatch = feats.toDF().join(Tables.documents(spark, sf0001), "doc_id")
      .filter(col("n_bytes") =!= col("n_chars")).count()
    assert(mismatch === 0)
    // decode stub is deterministic: re-run yields identical phashes
    val again = MultimodalOps.featurize(spark, sf0001, batchSize = 64)
    val diff = feats.toDF().select("doc_id", "phash")
      .except(again.toDF().select("doc_id", "phash")).count()
    assert(diff === 0)
  }

  test("media_feature_stats aggregates by format with full coverage") {
    val stats = MultimodalOps.mediaFeatureStats(spark, sf0001).collect()
    assert(stats.map(_.getAs[String]("format")).toSeq === Seq("jpeg", "png"))
    assert(stats.map(_.getAs[Long]("n_media")).sum ===
      Tables.documents(spark, sf0001).count())
  }
}
