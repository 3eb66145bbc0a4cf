package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan diagnostic for the bm25 cold-vs-index CPU gap found in the
  * r13 x10 sanity run (dev tool, not a declared query): prints the
  * formatted physical plan of both paths so the execution difference is
  * visible instead of guessed.
  */
object Bm25Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/scaledata/x10")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("=== INDEX PATH ===")
    graft.operators.TextOps.bm25IndexTopk(spark, sfDir).explain("formatted")
    println("=== COLD PATH ===")
    spark.catalog.clearCache()
    graft.operators.TextOps.bm25TopK(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
