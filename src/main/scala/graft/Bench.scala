package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run benchmark: times each SparkEntry query at the SF pointed to by
  * SPARK_GRAFT_SF_DIR, on local[$SPARK_GRAFT_CPUS].
  *
  * Protocol (VERDICT r1 items 3-4, hardened in r2):
  *   - each query runs in a FRESH SparkSession (stopped after): 40 queries'
  *     accumulated broadcasts/codegen/GC debt was observed to swing a
  *     4-second query to 200+ seconds late in a shared-JVM run;
  *   - per session: one trivial warm-up job (executors+codegen), one
  *     untimed query execution (plan + IO cache), then the timed run;
  *   - a failing query records "error":"<class>" instead of a fake timing;
  *   - the JSON line goes to stdout (clean `{` first column) AND
  *     target/bench.json.
  *
  * Args: optional query names to bench just those.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s.range(1000000L).selectExpr("sum(id)").collect() // spin executors + codegen
      s
    }

    val only = args.toSet
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        val spark = newSession()
        try {
          fn(spark, sfDir).count() // warm-up run (plan + IO caches)
          val t0 = System.nanoTime()
          fn(spark, sfDir).count() // steady-state timed run
          timings(name) = (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            errors(name) = e.getClass.getSimpleName
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        } finally {
          spark.stop()
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
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
    if (errors.nonEmpty) sys.exit(1)
  }
}
