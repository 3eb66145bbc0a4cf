package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of one or all declared
  * queries. Usage:
  *   sbt "runMain graft.Explain <sfDir> [queryName]"
  * The scale checklist per plan: filters/columns pushed into the parquet
  * scan (PushedFilters / ReadSchema), broadcast where a side is small,
  * WholeStageCodegen spans wide, no CartesianProduct in a hot path, no
  * unexpected extra Exchange.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
      }
    spark.stop()
  }
}
