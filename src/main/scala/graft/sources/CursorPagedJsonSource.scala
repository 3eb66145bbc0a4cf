package graft.sources

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for CURSOR-FOLLOWING pagination — the executable
  * twin of the reference transport's runtime `Link: rel="next"` walk
  * (`/root/reference/main.py:90-93`, `resp.links["next"]`), which the
  * listing-based [[PagedJsonSource]] cannot model: there the page space is
  * enumerable up front; here each page's successor is KNOWN ONLY from the
  * page itself, exactly like a live paginated HTTP API.
  *
  * Page archive format is an HTTP response capture (status line + headers +
  * blank line + body — the layout crawl archives store), so the "transport"
  * is byte-faithful to what a live fetch returns; a live-HTTP variant swaps
  * the byte source and keeps the header-walk and reader logic unchanged.
  *
  * Scale design: pagination cursors are INHERENTLY sequential — the next
  * page's identity does not exist until the current one is fetched (the
  * reference pays this cost too, one GET at a time). The split that keeps a
  * cluster busy anyway:
  *   - chain DISCOVERY (driver, `planInputPartitions`): per chain directory,
  *     follow `Link` headers reading HEADERS ONLY — O(pages) tiny reads,
  *     done concurrently across chains (one endpoint ≙ one chain; a lake
  *     has many);
  *   - page BODIES: one InputPartition per discovered page, fetched in
  *     parallel by executors with the shared bounded-backoff [[RetryPolicy]].
  * Cycle/missing-start chains fail loudly at plan time — a silent partial
  * chain would be dropped data.
  *
  * Usage: `spark.read.format("graft.sources.CursorPagedJsonSource")
  * .load(dir)` where `dir/<chain>/start.json` heads each chain. Output
  * schema matches [[PagedJsonSource]]: (value STRING, src_file STRING).
  */
class CursorPagedJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedJsonSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new CursorPagedJsonTable(properties.get("path"))
}

object CursorPagedJsonSource {
  val StartPage = "start.json"
  private val LinkHeader = """Link: <([^>]+)>; rel="next"""".r

  /** Reads the response-capture HEADER block of one page (status line +
    * headers, up to the blank separator) and returns the next-page token, if
    * any. Reads only the header bytes — body size is irrelevant to the walk.
    */
  def nextLink(fs: FileSystem, file: HPath): Option[String] = {
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(file), "UTF-8"))
    try {
      var link: Option[String] = None
      var line = in.readLine()
      require(line != null && line.startsWith("HTTP/"),
        s"$file is not a response capture (missing status line)")
      line = in.readLine()
      while (line != null && line.nonEmpty) {
        LinkHeader.findFirstMatchIn(line).foreach(m => link = Some(m.group(1)))
        line = in.readLine()
      }
      link
    } finally in.close()
  }

  /** Follows one chain from `start.json`, failing loudly on a missing head,
    * a dangling link, or a cycle. Returns page files in fetch order.
    */
  def walkChain(fs: FileSystem, chainDir: HPath): Seq[HPath] = {
    val pages = mutable.ArrayBuffer[HPath]()
    val seen = mutable.HashSet[String]()
    var cur: Option[String] = Some(StartPage)
    while (cur.isDefined) {
      val token = cur.get
      if (!seen.add(token))
        throw new IllegalStateException(
          s"CursorPagedJsonSource: cursor cycle at $chainDir/$token — " +
            "the chain revisits a page; refusing to emit duplicated data.")
      val file = new HPath(chainDir, token)
      if (!fs.exists(file))
        throw new IllegalStateException(
          s"CursorPagedJsonSource: dangling cursor $chainDir/$token — " +
            "a linked page is missing; refusing to emit a silently " +
            "truncated chain.")
      pages += file
      cur = nextLink(fs, file)
    }
    pages.toSeq
  }
}

class CursorPagedJsonTable(path: String) extends Table with SupportsRead {
  require(path != null && path.nonEmpty,
    "CursorPagedJsonSource requires .load(<path>)")
  override def name(): String = s"cursor_paged_json:`$path`"
  override def schema(): StructType = PagedJsonSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = new CursorPagedJsonScan(path) }
}

class CursorPagedJsonScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = PagedJsonSource.schema
  override def toBatch: Batch = this

  /** Chain dirs = directories containing a `start.json` head (any depth of
    * partition-style nesting above them); each is walked by link-following —
    * the page list is NOT obtainable by listing, the tokens are opaque.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    val root = new HPath(path)
    val fs = root.getFileSystem(conf)
    val chains = mutable.ArrayBuffer[HPath]()
    def findChains(dir: HPath): Unit = {
      val entries = fs.listStatus(dir)
      if (entries.exists(e => e.isFile &&
          e.getPath.getName == CursorPagedJsonSource.StartPage)) chains += dir
      entries.filter(_.isDirectory)
        .filterNot(e => e.getPath.getName.startsWith("_"))
        .foreach(e => findChains(e.getPath))
    }
    findChains(root)
    require(chains.nonEmpty,
      s"CursorPagedJsonSource: no chain heads (${CursorPagedJsonSource.StartPage}) under $path")
    // Each chain's walk is inherently sequential (that is what a cursor IS),
    // but chains are independent — walk them CONCURRENTLY so discovery
    // latency is max(chain length), not sum. Bounded pool: header reads are
    // tiny I/O-bound requests; 16 in flight saturates a metadata service
    // without hammering it.
    val sorted = chains.sortBy(_.toString).toSeq
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, math.max(1, sorted.size)))
    try {
      val futures = sorted.map(c => pool.submit(
        new java.util.concurrent.Callable[Seq[HPath]] {
          override def call(): Seq[HPath] = CursorPagedJsonSource.walkChain(fs, c)
        }))
      futures.flatMap { f =>
        try f.get()
        catch {
          // keep the connector's fail-loud contract: callers see the walk's
          // own IllegalStateException, not the executor's wrapper — and the
          // other in-flight walks are cancelled, the plan is already dead
          case e: java.util.concurrent.ExecutionException =>
            pool.shutdownNow()
            throw Option(e.getCause).getOrElse(e)
        }
      }
        .map(f => CursorPagePartition(f.toString): InputPartition)
        .toArray
    } finally pool.shutdown()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CursorPageReaderFactory
}

case class CursorPagePartition(file: String) extends InputPartition

class CursorPageReaderFactory extends PartitionReaderFactory {
  // one Configuration per executor-side factory instance, not per partition:
  // Configuration construction parses XML resources — per-reader it dominates
  // small-page reads
  @transient private lazy val conf = new org.apache.hadoop.conf.Configuration()

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[CursorPagePartition].file
    new PartitionReader[InternalRow] {
      // one atomic "fetch" per page, retried whole (same contract as
      // PageFileReaderFactory); the header block is skipped — it already
      // served its purpose during the plan-time walk
      private lazy val lines: Iterator[String] = {
        val p = new HPath(file)
        RetryPolicy.withRetry() { () =>
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(p.getFileSystem(conf).open(p), "UTF-8"))
          try {
            var line = in.readLine() // status line
            line = in.readLine()
            while (line != null && line.nonEmpty) line = in.readLine() // headers
            val buf = scala.collection.mutable.ArrayBuffer[String]()
            line = in.readLine()
            while (line != null) { buf += line; line = in.readLine() }
            buf.iterator
          } finally in.close()
        }
      }
      private var line: String = _
      override def next(): Boolean =
        if (lines.hasNext) { line = lines.next(); true } else false
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(line), UTF8String.fromString(file))
      override def close(): Unit = ()
    }
  }
}
