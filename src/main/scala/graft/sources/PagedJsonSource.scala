package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's paginated-source semantics
  * (SURVEY §2.1 ops #1-3, `main.py:85-115`): the transport yields raw PAGES;
  * parsing is downstream's job (`from_json` + `explode`), mirroring the
  * reference's `get_pages` → `_extract_*` split.
  *
  * Scale design (the point of the exercise): `planInputPartitions` returns
  * ONE InputPartition PER PAGE — the DSv2 analogue of "partitions = page
  * ranges" (SURVEY §1.1). A thousand executors fetch a thousand pages
  * concurrently; no driver-side fan-in. Here pages are the raw-zone files a
  * prior extract archived; a live-HTTP variant would swap the reader's
  * byte source and keep every interface the same.
  *
  * Usage: `spark.read.format("graft.sources.PagedJsonSource").load(dir)`
  * → rows (value: STRING page payload, src_file: STRING provenance).
  */
class PagedJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedJsonSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new PagedJsonTable(properties.get("path"))
}

object PagedJsonSource {
  val schema: StructType = StructType(Seq(
    StructField("value", StringType),
    StructField("src_file", StringType)))
}

class PagedJsonTable(path: String) extends Table with SupportsRead {
  require(path != null && path.nonEmpty, "PagedJsonSource requires .load(<path>)")
  override def name(): String = s"paged_json:`$path`"
  override def schema(): StructType = PagedJsonSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = new PagedJsonScan(path) }
}

class PagedJsonScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = PagedJsonSource.schema
  override def toBatch: Batch = this

  /** One partition per page file — the pagination cursor space IS the
    * parallelism dimension.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    val root = new HPath(path)
    val fs = root.getFileSystem(conf)
    val it = fs.listFiles(root, /* recursive = */ true)
    val files = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (f.isFile && !n.startsWith(".") && !n.startsWith("_"))
        files += f.getPath.toString
    }
    files.sorted.map(PageFilePartition(_): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PageFileReaderFactory(SerializableHadoopConf.fromSession())
}

case class PageFilePartition(file: String) extends InputPartition

/** Bounded exponential-backoff retry, mirroring the reference transport's
  * `SessionWithRetry` contract (`main.py:55-82`): at most `maxRetries`
  * retries after the first attempt, delays of base·2⁰, base·2¹, … between
  * attempts. Where the reference hands the still-failed response back to a
  * caller that raises, we rethrow the final failure — same observable
  * behavior: the task fails after exactly maxRetries + 1 attempts.
  * `sleep` is injectable so specs can count delays without waiting.
  */
object RetryPolicy {
  val DefaultMaxRetries = 3
  val DefaultBaseDelayMs = 500L

  /** Failures that can never heal with time — retrying them only delays the
    * inevitable rethrow by the full backoff schedule (ADVICE r3: a missing
    * page file cost ~3.5 s of blind sleeps before failing anyway).
    */
  private def nonTransient(e: Exception): Boolean = e match {
    case _: java.io.FileNotFoundException => true
    case _ => false
  }

  def withRetry[T](maxRetries: Int = DefaultMaxRetries,
      baseDelayMs: Long = DefaultBaseDelayMs,
      sleep: Long => Unit = Thread.sleep)(attempt: () => T): T = {
    var retryCount = 0
    while (true) {
      try return attempt()
      catch {
        // Spark cancels tasks by interrupting them — propagate immediately
        // (with the flag restored) instead of sleeping through the backoff
        // schedule while the scheduler waits (ADVICE r3).
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw e
        case e: Exception if nonTransient(e) => throw e
        case e: Exception =>
          if (retryCount < maxRetries) {
            // an interrupt landing DURING the backoff sleep must also leave
            // with the flag restored (ADVICE r4 — same scheduler-wait hazard
            // as above, just on the sleep path)
            try sleep(baseDelayMs << retryCount)
            catch {
              case ie: InterruptedException =>
                Thread.currentThread().interrupt()
                throw ie
            }
            retryCount += 1
          } else throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Java-serializable Hadoop-conf carrier (ADVICE r7): the reader factories
  * used to construct a bare `new Configuration()` on executors, silently
  * dropping every setting applied to `spark.hadoopConfiguration` —
  * credentials, custom filesystem schemes — while plan-time discovery used
  * the session's conf, an inconsistency on any non-local FS. Spark's own
  * `SerializableConfiguration` is `private[spark]`; this is the same
  * write/readFields shim. Factories are built on the driver and serialized
  * once per executor, so the conf still parses once per factory instance,
  * not per partition.
  */
class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

object SerializableHadoopConf {
  /** The active session's Hadoop conf, wrapped — call on the driver. */
  def fromSession(): SerializableHadoopConf =
    new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
}

class PageFileReaderFactory(confHolder: SerializableHadoopConf)
    extends PartitionReaderFactory {
  private def conf = confHolder.value

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[PageFilePartition].file
    new PartitionReader[InternalRow] {
      // A "fetch" is atomic per page (like one HTTP GET): on failure the
      // WHOLE page is re-fetched — never resumed mid-stream, which could
      // silently drop or duplicate rows. Pages are bounded (per_page=100,
      // reference main.py:52), so buffering one page is O(page), not O(task).
      private lazy val lines: Iterator[String] = {
        val p = new HPath(file)
        RetryPolicy.withRetry() { () =>
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(p.getFileSystem(conf).open(p), "UTF-8"))
          try {
            val buf = scala.collection.mutable.ArrayBuffer[String]()
            var line = in.readLine()
            while (line != null) { buf += line; line = in.readLine() }
            buf.iterator
          } finally in.close()
        }
      }
      private var line: String = _
      override def next(): Boolean = {
        if (lines.hasNext) { line = lines.next(); true } else false
      }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(line), UTF8String.fromString(file))
      override def close(): Unit = ()
    }
  }
}
