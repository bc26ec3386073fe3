package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.streaming.{AmqpEndpointRegistry, AmqpMessage, AmqpValueBody}

/** Puts the AMQP source itself under the DuckDB oracle gate: a
  * deterministic slice of the `events` table is pumped through a fresh
  * in-process broker (driver plays the producer, exactly like the
  * reference's test senders — AMQPTestUtils.scala:99-125 in
  * /root/reference), read back through `spark.read.format("amqp")`, and
  * aggregated. The oracle computes the same aggregate straight from the
  * parquet table, so any loss, duplication, or field corruption in the
  * envelope path (send → credit window → sequence buffer → batch scan →
  * envelope decode → converter columns) breaks the hash match.
  *
  * The pump respects the credit window (1000): refused sends drain the
  * pending slice via fetch — the same consume-to-replenish contract the
  * streaming reader exercises (BASELINE.md credit constants).
  */
object IngestQueries {

  def amqpIngestRoundtrip(s: SparkSession, d: String): DataFrame = {
    // Fixed endpoint + reset: Bench/Verify invoke this repeatedly in one
    // JVM; a fresh UUID endpoint each time would leak a full copy of the
    // pumped slice into the registry per warm run.
    val ep = "mem://gate-ingest"
    AmqpEndpointRegistry.reset(ep)
    val broker = AmqpEndpointRegistry.broker(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 10 === 0)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect() // the producer role: driver-side by design, as in the reference's suites
    var i = 0
    var fetchedUpTo = 0L
    while (i < rows.length) {
      val r = rows(i)
      val seq = broker.send("gate", AmqpMessage(
        messageId = Some(r.getLong(0).toString),
        subject = Some(r.getString(1)),
        body = AmqpValueBody(r.getDouble(2).toString)),
        timestampMicros = r.getLong(0))
      if (seq >= 0) i += 1
      else { // credit window exhausted: consuming replenishes it
        val to = broker.latestSeq("gate")
        broker.fetch("gate", fetchedUpTo, to)
        fetchedUpTo = to
      }
    }
    s.read.format("amqp")
      .option("endpoint", ep).option("address", "gate").load()
      .select(col("subject").as("event_type"),
        col("body").cast(DoubleType).as("value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
  }

  val amqpIngestRoundtripSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_id % 10 = 0
      |GROUP BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "amqp_ingest_roundtrip" -> (amqpIngestRoundtrip _))

  val oracleSql: Map[String, String] = Map(
    "amqp_ingest_roundtrip" -> amqpIngestRoundtripSql)
}
