package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run benchmark: times each SparkEntry query at the SF pointed to by
  * SPARK_GRAFT_SF_DIR, on local[$SPARK_GRAFT_CPUS].
  *
  * Protocol (VERDICT r1 items 3-4):
  *   - one warm-up execution per query (absorbs codegen/parquet-footer/JIT
  *     first-job cost), then the timed steady-state run;
  *   - a failing query records "error":"<class>" instead of a fake timing;
  *   - the JSON line is printed to stdout with a "GRAFT_BENCH " sentinel-free
  *     clean `{` first column AND written to target/bench.json so the driver
  *     can parse either.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Global warm-up: spin executors + codegen on a trivial job so the first
    // query isn't billed for session start.
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val only = args.toSet // optional: bench just the named queries
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).count() // warm-up run (plan + IO caches)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count() // steady-state timed run
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors(name) = e.getClass.getSimpleName
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
    }

    val qs = timings.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = timings.values.sum
    val json =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"errors":$es,"n_ok":${timings.size},"n_err":${errors.size},"sf":"$sfDir"}"""
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/bench.json"), json + "\n")
    println(json)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
