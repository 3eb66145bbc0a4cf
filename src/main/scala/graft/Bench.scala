package graft

import java.lang.management.ManagementFactory
import java.nio.file.{Files, Paths}
import java.util.Locale
import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times each SparkEntry query at the SF pointed to by
  * SPARK_GRAFT_SF_DIR, on local[$SPARK_GRAFT_CPUS].
  *
  * Isolation protocol (VERDICT r3 item 1: identical plans swung 0.3 s ↔ 8.6 s
  * from heap/GC debt accumulated across 56 queries sharing one JVM):
  *   - heavy / allocation-sensitive queries each run in their OWN FORKED JVM
  *     (same flags, classpath and env as this one);
  *   - the remaining sub-second queries run in small batched child JVMs
  *     (clearCache + System.gc between queries) — a full solo-fork sweep cost
  *     1413 s of wall for ~35 s of measured work in round 4, which risks
  *     driver timeouts for no extra isolation of queries that allocate ~nothing;
  *   - per child JVM: one trivial warm-up job (executors + codegen), then per
  *     query one untimed execution (plan + IO cache) and one timed run;
  *   - children also report GC time accrued DURING the timed run so residual
  *     noise is diagnosable; a failing/timed-out child records an error
  *     instead of a fake timing.
  *
  * Output protocol (round 4 regression: the driver captures only the TAIL of
  * stdout, and a single JSON line carrying queries + gc_sec + errors grew past
  * the capture window, truncating the leading `"metric":"total"` → the driver
  * recorded `parsed: null`). Therefore:
  *   - the FINAL stdout line is the compact contract line only:
  *     {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *   - gc/error/mode diagnostics go on a separate earlier line and into
  *     target/bench.json, where truncation costs nothing.
  *
  * Escape hatch: SPARK_GRAFT_BENCH_FORK=0 falls back to in-process mode
  * (fresh session per query + System.gc() between queries) — used by quick
  * interactive runs where JVM spin-up isn't worth it.
  *
  * Args: optional query names to bench just those; `--child <n1,n2,...>` is
  * the internal per-child entry point.
  */
object Bench {

  private val ChildResultPrefix = "GRAFT_BENCH_CHILD "

  /** Queries that get a dedicated child JVM: the near-dup / ANN / pipeline
    * family whose allocation profile or multi-job structure is exactly what
    * made shared-JVM timings irreproducible in rounds 2–4.
    */
  private val soloQueries = Set(
    "neardup_jaccard_pairs", "neardup_minhash_lsh", "simhash_neardup",
    "cosine_neardup_pairs", "media_feature_stats", "raw_pipeline_runs",
    "paged_connector_runs", "ann_cosine_topk", "ann_ivf_topk", "ann_lsh_topk",
    "tfidf_top_terms")
  private val BatchSize = 12

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

  private def fmt(v: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(v))

  /** Child-JVM entry: run the named queries in one session, one marker line
    * each; a query failure is reported on its marker and does not kill the
    * remaining queries in the batch.
    */
  private def runChild(names: Seq[String]): Unit = {
    val spark = newSession()
    try {
      names.foreach { name =>
        SparkEntry.queries.get(name) match {
          case None =>
            println(s"""$ChildResultPrefix{"name":"$name","error":"unknown query"}""")
          case Some(fn) =>
            try {
              val (sec, gcSec) = timeQuery(spark, fn)
              println(s"""$ChildResultPrefix{"name":"$name","sec":${fmt(sec)},"gc_sec":${fmt(gcSec)}}""")
            } catch {
              case e: Throwable =>
                println(s"""$ChildResultPrefix{"name":"$name","error":"${e.getClass.getSimpleName}"}""")
                System.err.println(s"[bench-child] $name FAILED: ${e.getMessage}")
            }
            // keep cached blocks / heap debt from leaking into the next
            // query's timing (the batch exists to amortize JVM startup only)
            spark.catalog.clearCache()
            System.gc()
        }
      }
    } finally spark.stop()
  }

  /** Spawn a child JVM mirroring this one (flags, classpath, env) for a batch
    * of queries; parse its marker lines. Per-query Left(error) or
    * Right((sec, gc)).
    */
  private def forkQueries(names: Seq[String]): Map[String, Either[String, (Double, Double)]] = {
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val jvmArgs = ManagementFactory.getRuntimeMXBean.getInputArguments.asScala.toSeq
    val cmd = Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", sys.props("java.class.path"), "graft.Bench", "--child", names.mkString(","))
    Files.createDirectories(Paths.get("target"))
    val outFile = Files.createTempFile(Paths.get("target"), "bench-child-", ".out")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(false)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    // stdout → file so the parent's wait timeout stays effective even if
    // the child wedges with its pipe full
    pb.redirectOutput(outFile.toFile)
    val p = pb.start()
    val timeoutMin = 20L + 5L * names.size
    if (!p.waitFor(timeoutMin, TimeUnit.MINUTES)) {
      p.destroyForcibly()
      Files.deleteIfExists(outFile)
      return names.map(_ -> Left("timeout")).toMap
    }
    val out = Files.readString(outFile)
    Files.deleteIfExists(outFile)
    val markers = out.linesIterator.filter(_.startsWith(ChildResultPrefix))
      .map(_.stripPrefix(ChildResultPrefix)).toSeq
    def strField(body: String, key: String): Option[String] =
      (s""""$key":"([^"]*)"""").r.findFirstMatchIn(body).map(_.group(1))
    val byName = markers.flatMap { body =>
      strField(body, "name").map(_ -> body)
    }.toMap
    names.map { name =>
      name -> (byName.get(name) match {
        case Some(body) =>
          val sec = """"sec":([0-9.]+)""".r.findFirstMatchIn(body).map(_.group(1).toDouble)
          val gc = """"gc_sec":([0-9.]+)""".r.findFirstMatchIn(body).map(_.group(1).toDouble)
          (sec, gc) match {
            case (Some(s), Some(g)) => Right((s, g))
            case _ => Left(strField(body, "error").getOrElse("unparseable child result"))
          }
        case None if p.exitValue() != 0 => Left(s"child exit ${p.exitValue()}")
        case None => Left("no child result")
      })
    }.toMap
  }

  /** ADVICE r4: under a classloader-isolating launcher (plain `sbt run`
    * without fork) java.class.path is just the sbt launcher jar and every
    * child dies with ClassNotFoundException — detect that up front.
    */
  private def requireForkableClasspath(): Unit = {
    val cpEntries = sys.props("java.class.path")
      .split(java.io.File.pathSeparator).map(_.trim).filter(_.nonEmpty)
    val resolvable = cpEntries.exists { e =>
      val p = Paths.get(e)
      Files.isDirectory(p) && Files.exists(p.resolve("graft/Bench$.class"))
    } || {
      // jar-packaged deploys: trust the classpath if our code source is on it
      val src = Option(getClass.getProtectionDomain.getCodeSource)
        .flatMap(cs => Option(cs.getLocation)).map(u => Paths.get(u.toURI).toString)
      src.exists(s => cpEntries.exists(e => Paths.get(e).toAbsolutePath.toString ==
        Paths.get(s).toAbsolutePath.toString))
    }
    if (!resolvable) sys.error(
      "graft.Bench is not resolvable from java.class.path — fork-mode children " +
        "would die with ClassNotFoundException. Launch with `sbt runMain` " +
        "(run/fork := true) or a java -cp that includes the compiled classes, " +
        "or set SPARK_GRAFT_BENCH_FORK=0 for in-process mode.")
  }

  def main(args: Array[String]): Unit = {
    // comma-decimal default locales corrupt both the f-interpolated JSON and
    // the child-marker parse (ADVICE r4) — pin everything to ROOT
    Locale.setDefault(Locale.ROOT)
    if (args.length == 2 && args(0) == "--child") {
      runChild(args(1).split(",").toSeq.filter(_.nonEmpty)); return
    }

    val fork = sys.env.getOrElse("SPARK_GRAFT_BENCH_FORK", "1") != "0"
    val only = args.toSet
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val gcs = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }

    if (fork) {
      requireForkableClasspath()
      // fork units: solo JVMs for the heavy family, batches for the rest
      val units = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      val batch = scala.collection.mutable.ArrayBuffer[String]()
      selected.foreach { case (name, _) =>
        if (soloQueries(name)) units += Seq(name)
        else {
          batch += name
          if (batch.size >= BatchSize) { units += batch.toSeq; batch.clear() }
        }
      }
      if (batch.nonEmpty) units += batch.toSeq
      val results = units.flatMap(u => forkQueries(u)).toMap
      selected.foreach { case (name, _) =>
        results.get(name) match {
          case Some(Right((sec, gc))) => timings(name) = sec; gcs(name) = gc
          case Some(Left(err)) =>
            errors(name) = err
            System.err.println(s"[bench] $name FAILED: $err")
          case None =>
            errors(name) = "missing result"
            System.err.println(s"[bench] $name FAILED: missing result")
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
      m.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = timings.values.sum
    val mode = if (fork) "fork" else "shared"
    // compact contract line — MUST stay short enough to survive the driver's
    // stdout tail capture in full (see scaladoc: round-4 parse failure)
    val contract =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${jmap(timings)},"sf":"$sfDir"}"""
    val detail =
      s"""{"bench_detail":{"gc_sec":${jmap(gcs)},"errors":$es,"n_ok":${timings.size},"n_err":${errors.size},"mode":"$mode","cpus":$cpus}}"""
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/bench.json"), detail + "\n" + contract + "\n")
    println(detail)
    println(contract)
    if (errors.nonEmpty) sys.exit(1)
  }
}
