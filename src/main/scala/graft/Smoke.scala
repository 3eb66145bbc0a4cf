package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner mirroring the driver's t1 gate: `SparkEntry.entry`
  * on sf0.001 must return >0 rows. Usage: `sbt "runMain graft.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // single execution: collect once, count + preview from the same rows
    val rows = SparkEntry.entry(spark).limit(21).collect()
    val n = rows.length
    rows.take(20).foreach(r => println(s"[smoke]   $r"))
    println(s"[smoke] entry rows=$n ${if (n > 0) "PASS" else "FAIL"}")
    spark.stop()
    if (n == 0) sys.exit(1)
  }
}
