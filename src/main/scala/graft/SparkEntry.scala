package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{EtlOps, GraphOps, JsonTimeOps, MultimodalOps, QualityOps, Relational, ScalarOps, TextOps, VectorOps}
import graft.pipeline.RawZone

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one entry per implemented operator (SURVEY.md §2); each takes
  * (session, sfDir) and returns a deterministic, totally-ordered DataFrame.
  * `oracleSql`: DuckDB-equivalent SQL per query key, over the same parquet
  * tables (bare table names). Column names/aliases must match the Spark
  * result exactly — the driver sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EtlOps.latestEventPerUser(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EtlOps.queries ++ Relational.queries ++ JsonTimeOps.queries ++
      TextOps.queries ++ VectorOps.queries ++ RawZone.queries ++
      MultimodalOps.queries ++ ScalarOps.queries ++ QualityOps.queries ++
      GraphOps.queries

  /** Queries benched in a dedicated child JVM (allocation-sensitive or
    * multi-job); aggregated from the modules that declare them so adding a
    * heavy query never requires a Bench edit (VERDICT r5 item 6).
    */
  def heavyQueries: Set[String] =
    TextOps.heavyQueries ++ VectorOps.heavyQueries ++
      MultimodalOps.heavyQueries ++ RawZone.heavyQueries ++
      Relational.heavyQueries ++ GraphOps.heavyQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EtlOps.oracleSql ++ Relational.oracleSql ++ JsonTimeOps.oracleSql ++
      TextOps.oracleSql ++ VectorOps.oracleSql ++ RawZone.oracleSql ++
      MultimodalOps.oracleSql ++ ScalarOps.oracleSql ++ QualityOps.oracleSql ++
      GraphOps.oracleSql
}
