package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing diagnostic for the near-dup hotspot (dev tool, not a
  * declared query). Mirrors the collapsed-reps MinHash-LSH pipeline of
  * TextOps.neardupMinhashLsh stage by stage.
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

    val groups = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        sort_array(array_distinct(transform(shingles(words(col("text"))), s => xxhash64(s)))).as("sh"))
      .withColumn("set_key",
        sha2(concat_ws(",", transform(col("sh"), x => x.cast("string"))), 256))
      .groupBy(col("lang"), col("set_key"))
      .agg(min(col("doc_id")).as("rep"),
        sort_array(collect_list(col("doc_id"))).as("members"),
        first(col("sh")).as("sh"))
      .drop("set_key")
      .persist()
    time("groups (collapse) materialize")(println("groups=" + groups.count()))

    val reps = groups.select(col("rep"), col("lang"), col("sh"))
    val exploded = reps.select(col("rep"), explode(col("sh")).as("shingle"))
    time("exploded count")(println("exploded=" + exploded.count()))

    val numHashes = 64
    val bands = 8
    val rowsPerBand = numHashes / bands
    val minhashes = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"mh$i"))
    val sig = exploded.groupBy(col("rep")).agg(minhashes.head, minhashes.tail: _*)
    time("sig (64 minhashes)")(println("sig=" + sig.count()))

    val bandCols = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bkey"))
    }
    val banded = sig.select(col("rep"), explode(array(bandCols: _*)).as("bk"))
      .select(col("rep"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      .persist()
    time("banded materialize")(println("banded=" + banded.count()))

    time("bucket histogram")(
      banded.groupBy(col("band"), col("bkey")).count()
        .groupBy(col("count").as("bucket_size")).count()
        .orderBy(col("bucket_size").desc).show(20, false))

    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.rep") < col("y.rep"))
      .select(col("x.rep").as("rep_a"), col("y.rep").as("rep_b"))
      .distinct()
    time("candidates count")(println("cand=" + cand.count()))

    val a = reps.select(col("rep").as("rep_a"), col("lang"), col("sh").as("sh_a"))
    val bb = reps.select(col("rep").as("rep_b"), col("lang").as("lang_b"), col("sh").as("sh_b"))
    val verified = cand.join(a, "rep_a").join(bb, "rep_b")
      .filter(col("lang") === col("lang_b"))
      .withColumn("jacc",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
      .filter(col("jacc") >= 0.8)
    time("verify count")(println("verified=" + verified.count()))

    spark.stop()
  }
}
