package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. The write/escape
  * machinery is shared with [[VerifySubset]] so the two tools cannot drift.
  */
object Verify {

  /** Session with the driver-contract knobs (same shape in both mains).
    * `defaultCpus` matches the driver's Verify default here; the dev subset
    * tool passes a higher one — its whole point is a faster iteration loop.
    */
  private[graft] def session(defaultCpus: String = "4"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  private[graft] def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Writes the selected queries' results (one parquet dir per query) and
    * the matching `oracle_sql.json` slice, in the exact layout the driver's
    * checker reads. `writeKeys` additionally emits `query_keys.json` — the
    * full key list so the checker can flag ANY query (oracle or not) whose
    * write failed; a broken op must not silently pass (ADVICE r1).
    */
  private[graft] def writeQueryDumps(spark: SparkSession, sfDir: String,
      outDir: String, selected: String => Boolean, writeKeys: Boolean): Unit = {
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(q => selected(q._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally spark.catalog.clearCache() // queries persist() internally; all
      // 50+ run in THIS one session, so drop each query's blocks before the
      // next (ADVICE r4 — unbounded cache accumulation)
    }
    val json = SparkEntry.oracleSql.filter(o => selected(o._1))
      .map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (writeKeys)
      Files.writeString(Paths.get(s"$outDir/query_keys.json"),
        SparkEntry.queries.keys.toSeq.sorted.map(jsonQuote).mkString("[", ",", "]"))
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = session()
    writeQueryDumps(spark, sfDir, outDir, _ => true, writeKeys = true)
    spark.stop()
  }
}
