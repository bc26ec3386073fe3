package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{DedupQueries, FormatQueries, IngestQueries, MultimodalQueries, RelationalQueries, SimilarityQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2
  * (plus the large-scale-pipeline operators); `oracleSql` carries the
  * DuckDB-equivalent SQL for the driver's correctness gate. Column names
  * are aliased identically on both sides (the compare sorts columns by
  * name before hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Batch twin of the reference's demonstrated query — the tumbling-window
    * aggregate over the event stream (AMQPTemperature.scala:97's
    * reduceByWindow(max), re-expressed as a window groupBy). */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q15EventsTumbling(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ MultimodalQueries.queries ++ IngestQueries.queries ++ FormatQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ TextQueries.oracleSql ++ DedupQueries.oracleSql ++
      SimilarityQueries.oracleSql ++ MultimodalQueries.oracleSql ++ IngestQueries.oracleSql ++ FormatQueries.oracleSql
}
