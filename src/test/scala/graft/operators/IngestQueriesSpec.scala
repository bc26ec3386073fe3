package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class IngestQueriesSpec extends SparkSpecBase {

  test("oracle map covers every query") {
    assert(IngestQueries.oracleSql.keySet == IngestQueries.queries.keySet)
  }

  test("ingest round-trip is lossless: counts match the parquet slice") {
    val out = IngestQueries.amqpIngestRoundtrip(spark, sfDir)
    val n = out.agg(sum(col("n_events"))).collect().head.getLong(0)
    val expected = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_id") % 10 === 0).count()
    assert(n == expected, s"envelope path lost or duplicated rows: $n vs $expected")
  }
}
