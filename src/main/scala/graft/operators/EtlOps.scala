package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Reference-semantics ETL operators (SURVEY.md §2.1), re-expressed as
  * declarative DataFrame transforms.
  *
  * The crown jewel is `latestPerKey` — the reference's latest-snapshot-per-run
  * dedup (`/root/reference/main.py:149-157`): newest extraction wins per run
  * id. Expressed as a window `row_number()==1`, which Spark executes as one
  * hash-partitioned shuffle by key + per-partition sort — the scalable form of
  * the reference's single-threaded seen-set.
  */
object EtlOps {

  /** Latest-snapshot-per-key dedup (reference `main.py:149-157`).
    * NOT `dropDuplicates(key)` — that keeps an arbitrary row; the reference
    * pins the newest, so we rank by explicit ordering columns.
    * Scale: one shuffle on `key`; skewed keys are handled by AQE skew
    * mitigation; at 100 TB prefer pre-bucketing the lake by `key`.
    */
  def latestPerKey(df: DataFrame, key: Seq[Column], newestFirst: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(newestFirst.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Flagship (SURVEY.md §7.2): reference E3 read-path semantics on `events` —
    * latest event per user (ts desc, event_id desc tie-break), then count
    * survivors per event_type, totally ordered.
    * Exercises scan → shuffle → window → agg → sort in one query.
    */
  def latestEventPerUser(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    latestPerKey(ev, Seq(col("user_id")), Seq(col("ts"), col("event_id")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("event_type"))
  }

  val latestEventPerUserSql: String =
    """SELECT event_type, count(*) AS n_users
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "latest_event_per_user" -> (latestEventPerUser(_, _))
  )

  def oracleSql: Map[String, String] = Map(
    "latest_event_per_user" -> latestEventPerUserSql
  )
}
