package graft

import java.lang.management.ManagementFactory
import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times each SparkEntry query at the SF pointed to by
  * SPARK_GRAFT_SF_DIR, on local[$SPARK_GRAFT_CPUS].
  *
  * Protocol (VERDICT r3 item 1 — the r2 "fresh SparkSession per query"
  * isolation was NOT enough: all 56 queries still shared one JVM, and the
  * driver's run showed identical plans swinging 0.3 s ↔ 8.6 s with
  * accumulated heap/GC debt):
  *   - each query now runs in its OWN FORKED JVM (same flags, classpath and
  *     env as this one) — heap state cannot leak between queries, so two
  *     consecutive full runs agree;
  *   - per child JVM: one trivial warm-up job (executors + codegen), one
  *     untimed query execution (plan + IO cache), then the timed run;
  *   - the child also reports the GC time accrued DURING the timed run, so
  *     any residual noise is diagnosable from the JSON ("gc_sec" map);
  *   - a failing/timed-out child records "error":"<reason>" instead of a
  *     fake timing;
  *   - the JSON line goes to stdout (clean `{` first column) AND
  *     target/bench.json.
  *
  * Escape hatch: SPARK_GRAFT_BENCH_FORK=0 falls back to the r3 in-process
  * mode (fresh session per query + System.gc() between queries) — used by
  * quick interactive runs where JVM spin-up per query isn't worth it.
  *
  * Args: optional query names to bench just those; `--child <name>` is the
  * internal per-query entry point.
  */
object Bench {

  private val ChildResultPrefix = "GRAFT_BENCH_CHILD "

  private def sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  private def cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  private def newSession(): SparkSession = {
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

  private def gcMillis(): Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(b.getCollectionTime, 0L)).sum

  /** Warm-up + timed run of one query in THIS JVM; (seconds, gcSeconds). */
  private def timeQuery(spark: SparkSession,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Double) = {
    fn(spark, sfDir).count() // warm-up run (plan + IO caches)
    val gc0 = gcMillis()
    val t0 = System.nanoTime()
    fn(spark, sfDir).count() // steady-state timed run
    ((System.nanoTime() - t0) / 1e9, (gcMillis() - gc0) / 1e3)
  }

  /** Child-JVM entry: run one query, print one marker line, exit. */
  private def runChild(name: String): Unit = {
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name"))
    val spark = newSession()
    try {
      val (sec, gcSec) = timeQuery(spark, fn)
      println(f"""$ChildResultPrefix{"name":"$name","sec":$sec%.3f,"gc_sec":$gcSec%.3f}""")
    } finally spark.stop()
  }

  /** Spawn a child JVM mirroring this one (flags, classpath, env) for one
    * query; parse its marker line. Returns Left(error) or Right((sec, gc)).
    */
  private def forkQuery(name: String): Either[String, (Double, Double)] = {
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val jvmArgs = ManagementFactory.getRuntimeMXBean.getInputArguments.asScala.toSeq
    val cmd = Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", sys.props("java.class.path"), "graft.Bench", "--child", name)
    Files.createDirectories(Paths.get("target"))
    val outFile = Files.createTempFile(Paths.get("target"), s"bench-$name-", ".out")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(false)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    // stdout → file so the parent's wait timeout stays effective even if
    // the child wedges with its pipe full
    pb.redirectOutput(outFile.toFile)
    val p = pb.start()
    if (!p.waitFor(20, TimeUnit.MINUTES)) {
      p.destroyForcibly()
      Files.deleteIfExists(outFile)
      return Left("timeout")
    }
    val out = Files.readString(outFile)
    Files.deleteIfExists(outFile)
    val line = out.linesIterator.find(_.startsWith(ChildResultPrefix))
    (p.exitValue(), line) match {
      case (0, Some(l)) =>
        val body = l.stripPrefix(ChildResultPrefix)
        val sec = """"sec":([0-9.]+)""".r.findFirstMatchIn(body).map(_.group(1).toDouble)
        val gc = """"gc_sec":([0-9.]+)""".r.findFirstMatchIn(body).map(_.group(1).toDouble)
        (sec, gc) match {
          case (Some(s), Some(g)) => Right((s, g))
          case _ => Left("unparseable child result")
        }
      case (code, _) => Left(s"child exit $code")
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.length == 2 && args(0) == "--child") { runChild(args(1)); return }

    val fork = sys.env.getOrElse("SPARK_GRAFT_BENCH_FORK", "1") != "0"
    val only = args.toSet
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val gcs = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }

    if (fork) {
      selected.foreach { case (name, _) =>
        forkQuery(name) match {
          case Right((sec, gc)) => timings(name) = sec; gcs(name) = gc
          case Left(err) =>
            errors(name) = err
            System.err.println(s"[bench] $name FAILED: $err")
        }
      }
    } else {
      selected.foreach { case (name, fn) =>
        val spark = newSession()
        try {
          val (sec, gcSec) = timeQuery(spark, fn)
          timings(name) = sec
          gcs(name) = gcSec
        } catch {
          case e: Throwable =>
            errors(name) = e.getClass.getSimpleName
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        } finally {
          spark.stop()
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
          System.gc() // drain heap debt before the next query's timing
        }
      }
    }

    def jmap(m: collection.Map[String, Double]): String =
      m.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = timings.values.sum
    val mode = if (fork) "fork" else "shared"
    val json =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":${jmap(timings)},"gc_sec":${jmap(gcs)},"errors":$es,"n_ok":${timings.size},"n_err":${errors.size},"mode":"$mode","sf":"$sfDir"}"""
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/bench.json"), json + "\n")
    println(json)
    if (errors.nonEmpty) sys.exit(1)
  }
}
