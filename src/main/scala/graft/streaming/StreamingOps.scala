package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.2 streaming row): the reference's
  * incremental-accumulation semantics (`main.py:149-157` — each run folds new
  * snapshots into latest-state) expressed as a real stream: file source →
  * watermark → dedup / windowed agg / custom keyed state → sink.
  *
  * Batch remains the oracle-checked path (DuckDB can't run a stream);
  * StreamingSpec drives these against the memory sink and cross-checks the
  * results against the equivalent batch query — streaming/batch parity is
  * exactly Spark's unified-Dataset contract.
  *
  * Scale notes: state stores (dedup set, window state, GroupState) shard by
  * the grouping key across executors; watermarks bound state size — without
  * one, dropDuplicates state grows unboundedly at 100 TB/day.
  */
object StreamingOps {

  /** JSONL event schema for the streaming source (a raw-zone-shaped feed). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_utc", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** File-source stream over a JSONL directory. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).json(dir)

  /** Streaming dedup on event_id within a 1-hour watermark — the streaming
    * form of the latest-per-key contract for at-least-once feeds (late
    * duplicates beyond the watermark age out of the state store).
    */
  def dedupedStream(events: DataFrame): DataFrame =
    events.withWatermark("ts_utc", "1 hour")
      .dropDuplicates("event_id")

  /** JSONL document-feed schema for streaming corpus ingest. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ingest_ts", TimestampType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  /** File-source stream over a JSONL document feed. */
  def readDocStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).json(dir)

  /** Streaming CONTENT dedup — the incremental-ingest form of
    * `TextOps.dedupExactDocs`: documents keyed by sha2(text), first arrival
    * per content hash survives. `dropDuplicatesWithinWatermark` is the
    * operator built for exactly this shape: the dedup KEY carries no event
    * time (a re-crawl of the same text arrives with a NEW ingest_ts, so
    * keying on (hash, ts) would never collapse it), yet state still ages
    * out at the watermark horizon instead of growing with corpus history.
    * At 100 TB/day the state store holds one (hash → seen) entry per
    * distinct document within the horizon, sharded by hash — the shuffle
    * carries (hash, id, meta), never text, same as the batch operator.
    */
  def dedupedDocStream(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("ingest_ts"), col("lang"),
        sha2(col("text"), 256).as("content_hash"))
      .withWatermark("ingest_ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("content_hash"))

  /** Tumbling 10-minute windowed counts per event_type with watermarking —
    * the streaming twin of JsonTimeOps.tumblingHourlyStats.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts_utc", "1 hour")
      .groupBy(window(col("ts_utc"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n_events"))

  /** Native session windows on the stream: 30-minute inactivity gap per
    * user — the streaming twin of JsonTimeOps.sessionCountsPerUser (which
    * derives the same sessions in batch via gaps-and-islands).
    */
  def sessionizedCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts_utc", "1 hour")
      .groupBy(session_window(col("ts_utc"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"))

  /** Stream-stream INNER interval join: each purchase joins the same user's
    * clicks from the preceding 30 minutes — the streaming twin of the batch
    * range join (`Relational.rangeClicksBeforePurchase`). Both sides carry
    * watermarks and the join predicate carries an explicit event-time range,
    * which is what lets Spark expire buffered rows: without the time bound a
    * stream-stream join must hold EVERY past row forever. State is sharded
    * by user_id; per-side retention ≈ watermark + interval, so state size is
    * bounded by feed rate × 1.5 h regardless of total history — the property
    * that keeps this runnable on an unbounded 100 TB/day feed.
    */
  def clickPurchaseStreamJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_utc").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_utc").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "1 hour")
    c.join(p,
      col("c_user") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("click_ts"), col("purchase_ts"))
  }

  case class UserStat(user_id: Long, n_events: Long, last_ts_us: Long,
      last_event_id: Long, max_value: Double)

  /** Custom keyed state via mapGroupsWithState: running per-user stats where
    * the newest event ((ts, event_id) ordering) wins the `last_event_id`
    * slot — the flagship dedup semantics as *incremental state* instead of a
    * batch window. The winner's (ts, id) key lives IN the state so ordering
    * survives across micro-batches.
    */
  def userStatsStream(spark: SparkSession, events: DataFrame): Dataset[UserStat] = {
    import spark.implicits._
    events
      .selectExpr("event_id", "user_id", "value",
        "unix_micros(ts_utc) AS ts_us")
      .as[(Long, Long, Double, Long)]
      .groupByKey(_._2)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Double, Long)], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(
            UserStat(user, 0L, Long.MinValue, Long.MinValue, Double.MinValue))
          var (n, lastTs, lastId, mx) =
            (prev.n_events, prev.last_ts_us, prev.last_event_id, prev.max_value)
          rows.foreach { case (eid, _, v, ts) =>
            n += 1
            if (ts > lastTs || (ts == lastTs && eid > lastId)) { lastTs = ts; lastId = eid }
            if (v > mx) mx = v
          }
          val next = UserStat(user, n, lastTs, lastId, mx)
          state.update(next)
          next
      }
  }
}
