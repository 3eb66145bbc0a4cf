package graft

import org.apache.spark.sql.SparkSession

/** Throwaway phase-timing harness for the Jaccard verify rework (dev tool). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect()

    for (i <- 1 to 3) {
      var t0 = System.nanoTime()
      val df = graft.operators.TextOps.neardupJaccardPairs(spark, sfDir)
      val tc = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val n = df.count()
      val ta = (System.nanoTime() - t0) / 1e9
      println(f"SCRATCH iter=$i construct(gate)=$tc%.2f s  action(verify)=$ta%.2f s  rows=$n")
    }
    spark.stop()
  }
}
