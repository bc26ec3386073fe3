package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Stateful streaming operators over the AMQP envelope stream.
  *
  * The reference's DStream surface has no stateful operators beyond WAL
  * recovery (SURVEY.md §2.3 "Streaming: stateful ops — absent"); these
  * are the Structured-Streaming-native capabilities a user of the
  * connector gets on top of the envelope DataFrame.
  *
  * Scale notes: both operators keep per-key state in the streaming state
  * store (RocksDB-backed on a real cluster), partitioned by key — state
  * size tracks distinct live keys, not stream length; the watermark
  * bounds the dedup buffer.
  */
object AmqpStreamOps {

  /** Exactly-once-by-id view of an at-least-once stream: drop redelivered
    * message ids, holding each id only until the watermark passes it —
    * the bounded-state streaming dedup (a redelivery storm after a crash
    * re-reads the unsettled tail; ids inside the watermark are caught).
    *
    * Precondition: messages carry a message_id. Spark's dropDuplicates
    * treats NULL as a regular key, so a stream of id-less messages would
    * collapse to one row per watermark window — route such streams
    * around this operator (or synthesize ids at the producer, as AMQP
    * brokers conventionally do).
    */
  def dedupByMessageId(envelope: DataFrame, delay: String = "10 seconds"): DataFrame =
    envelope
      .withWatermark("ingest_timestamp", delay)
      .dropDuplicatesWithinWatermark("message_id")

  case class Reading(key: String, value: Int)
  case class MaxUpdate(key: String, max_value: Int)

  /** Change-log of the per-key running maximum via
    * flatMapGroupsWithState: emits a row only when a key's max advances.
    * The stateful (unwindowed) generalization of the reference's
    * demonstrated reduceByWindow(max) query (AMQPTemperature.scala:97 in
    * /root/reference) — state is one int per key, forever-running.
    *
    * Input: the envelope stream; `keyCol`/`valueCol` select the grouping
    * key and the integer measurement (for the temperature example:
    * subject / the C1-converted body). */
  def runningMaxChangelog(envelope: DataFrame, keyCol: String, valueCol: String): Dataset[MaxUpdate] = {
    implicit val re = Encoders.product[Reading]
    implicit val me = Encoders.product[MaxUpdate]
    implicit val ie = Encoders.scalaInt
    implicit val se = Encoders.STRING
    envelope
      .select(col(keyCol).cast("string").as("key"), col(valueCol).cast("int").as("value"))
      .as[Reading]
      .groupByKey(_.key)
      .flatMapGroupsWithState[Int, MaxUpdate](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Reading], state: GroupState[Int]) =>
          val prev = state.getOption
          val batchMax = rows.map(_.value).foldLeft(Int.MinValue)(math.max)
          if (prev.forall(batchMax > _)) {
            state.update(batchMax)
            Iterator(MaxUpdate(key, batchMax))
          } else Iterator.empty
      }
  }

  /** The same running-max changelog on Spark 4's `transformWithState`
    * (the successor of [[runningMaxChangelog]]'s flatMapGroupsWithState):
    * typed state variables via a [[StatefulProcessor]], per-state TTL,
    * and timer support — the API a long-running 100 TB pipeline should
    * target, since state lives in the RocksDB store (the only provider
    * the new API supports) with changelog checkpointing. Semantics are
    * identical to the old-API operator, which the spec exploits by
    * running BOTH against the same stream and asserting equal output.
    */
  def runningMaxChangelogTws(envelope: DataFrame, keyCol: String,
      valueCol: String): Dataset[MaxUpdate] = {
    implicit val re = Encoders.product[Reading]
    implicit val me = Encoders.product[MaxUpdate]
    implicit val se = Encoders.STRING
    envelope
      .select(col(keyCol).cast("string").as("key"), col(valueCol).cast("int").as("value"))
      .as[Reading]
      .groupByKey(_.key)
      .transformWithState(new RunningMaxProcessor, TimeMode.None(), OutputMode.Append())
  }

  private class RunningMaxProcessor extends StatefulProcessor[String, Reading, MaxUpdate] {
    @transient private var maxState: ValueState[Int] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      maxState = getHandle.getValueState[Int]("max", Encoders.scalaInt, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[Reading],
        timerValues: TimerValues): Iterator[MaxUpdate] = {
      val prev = if (maxState.exists()) Some(maxState.get()) else None
      val batchMax = rows.map(_.value).foldLeft(Int.MinValue)(math.max)
      if (prev.forall(batchMax > _)) {
        maxState.update(batchMax)
        Iterator(MaxUpdate(key, batchMax))
      } else Iterator.empty
    }
  }
}
