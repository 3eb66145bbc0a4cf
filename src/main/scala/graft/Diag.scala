package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing diagnostic for the near-dup hotspot (dev tool, not a
  * declared query).
  */
object Diag {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"DIAG $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("diag")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)

    def words(c: org.apache.spark.sql.Column) = filter(split(c, " "), w => w =!= "")
    def shingles(wordsCol: org.apache.spark.sql.Column) =
      array_distinct(
        when(size(wordsCol) >= 3,
          transform(sequence(lit(1), size(wordsCol) - 2),
            i => concat_ws(" ", slice(wordsCol, i, lit(3)))))
          .otherwise(array(concat_ws(" ", wordsCol))))

    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        array_distinct(transform(shingles(words(col("text"))), s => xxhash64(s))).as("sh"))

    time("docs shingle+hash count")(println(docs.count()))
    val cached = docs.cache()
    time("docs cache materialize")(println(cached.count()))

    val exploded = cached.select(col("doc_id"), explode(col("sh")).as("shingle"))
    time("exploded count")(println(exploded.count()))

    val numHashes = 32
    val bands = 8
    val rowsPerBand = numHashes / bands
    val minhashes = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"mh$i"))
    val sig = exploded.groupBy(col("doc_id")).agg(minhashes.head, minhashes.tail: _*)
    time("sig (32 minhashes)")(println(sig.count()))

    val bandCols = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bkey"))
    }
    val banded = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      .cache()
    time("banded materialize")(println(banded.count()))

    time("bucket histogram")(
      banded.groupBy(col("band"), col("bkey")).count()
        .groupBy(col("count").as("bucket_size")).count()
        .orderBy(col("bucket_size").desc).show(20, false))

    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    time("candidates count")(println(cand.count()))

    spark.stop()
  }
}
