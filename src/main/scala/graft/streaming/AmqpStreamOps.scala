package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState,
  MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues,
  ValueState}

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

  case class SessionEvent(key: String, value: Int, ts_ms: Long)
  case class SessionFlush(key: String, n_events: Int, sum_value: Int)

  /** Idle-session flush via EVENT-TIME TIMERS — the capability that
    * distinguishes `transformWithState` from every prior state API: a
    * per-key timer re-armed to (last event time + gap) on each arrival,
    * firing in `handleExpiredTimer` once the watermark passes it. The
    * session emits exactly when the key goes idle — no per-batch
    * timeout polling, no GroupStateTimeout coarseness — and state
    * clears on flush, so live state tracks OPEN sessions only.
    *
    * BATCH-BOUNDARY INVARIANCE: sessions are event-time islands, so a
    * batch whose rows span an idle gap is split IN-LINE — each completed
    * island flushes from `handleInputRows` and only the tail session
    * stays open under a timer. Without this, replaying a deep backlog
    * (Trigger.AvailableNow lands it in few big batches) would merge
    * every island of a key into one giant session — output would depend
    * on how the micro-batch planner happened to cut batches, an
    * operationally arbitrary boundary. With it, output is a pure
    * function of (events, gap), which is what lets the DuckDB
    * gaps-and-islands oracle gate this operator at all
    * (`amqp_stream_tws_timer`).
    *
    * Scale shape: one (count, sum, timer) register per live key in the
    * RocksDB store; timers are store-managed and fire from the
    * watermark, so an idle key costs nothing per batch; the in-line
    * split sorts only one key's in-batch rows (bounded by the trigger
    * budget), never cross-key data. */
  def sessionFlushTws(envelope: DataFrame, keyCol: String, valueCol: String,
      gapMs: Long, watermarkDelay: String = "0 seconds"): Dataset[SessionFlush] = {
    implicit val ee = Encoders.product[SessionEvent]
    implicit val fe = Encoders.product[SessionFlush]
    implicit val se = Encoders.STRING
    envelope
      .withWatermark("ingest_timestamp", watermarkDelay)
      .select(col(keyCol).cast("string").as("key"),
        col(valueCol).cast("int").as("value"),
        (col("ingest_timestamp").cast("double") * 1000).cast("long").as("ts_ms"))
      .as[SessionEvent]
      .groupByKey(_.key)
      .transformWithState(new SessionFlushProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  private class SessionFlushProcessor(gapMs: Long)
    extends StatefulProcessor[String, SessionEvent, SessionFlush] {
    // (n_events, sum_value, armed timer ms)
    @transient private var agg: ValueState[(Int, Int, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[(Int, Int, Long)]("sess",
        Encoders.product[(Int, Int, Long)], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[SessionFlush] = {
      var (n, sum, timer) = if (agg.exists()) agg.get() else (0, 0, 0L)
      val prevArmed = timer
      // In-line island split: with an open session, timer == lastMaxTs
      // + gap, so an event strictly AFTER the armed deadline is in a
      // new session — flush the completed island immediately. Rows are
      // sorted by event time first so islands inside one batch resolve
      // identically however the micro-batch planner cut the stream. A
      // LATE (within-watermark) event sorts below the deadline and
      // merges into the open session without shrinking it — the timer
      // may only ever EXTEND (a shrink would flush early and split the
      // session in two).
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionFlush]
      val sorted = rows.toArray
      java.util.Arrays.sort(sorted, Ordering.by((e: SessionEvent) => e.ts_ms))
      sorted.foreach { r =>
        if (n > 0 && r.ts_ms > timer) {
          out += SessionFlush(key, n, sum)
          n = 0; sum = 0
        }
        n += 1
        sum += r.value
        timer = math.max(timer, r.ts_ms + gapMs)
      }
      if (timer != prevArmed) {
        if (prevArmed > 0L) getHandle.deleteTimer(prevArmed) // re-arm on activity
        getHandle.registerTimer(timer)
      }
      agg.update((n, sum, timer))
      out.iterator
    }
    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo):
        Iterator[SessionFlush] = {
      val out = if (agg.exists()) {
        val (n, sum, armed) = agg.get()
        // only the CURRENT timer flushes; a stale one (deleted late by
        // the store) must not double-emit
        if (armed == expiredTimerInfo.getExpiryTimeInMs) {
          agg.clear()
          Iterator.single(SessionFlush(key, n, sum))
        } else Iterator.empty
      } else Iterator.empty
      out
    }
  }

  case class LagRow(address: String, head_seq: Long, committed_seq: Long, lag: Long)

  /** CONSUMER-LAG report (Kafka `kafka-consumer-groups --describe`
    * parity): per subscribed address, how far consumption trails
    * production — head = the broker ledger's latest sequence,
    * committed = the query's durably committed position, lag = the
    * unconsumed backlog. Where Kafka keeps the group's position
    * broker-side, a Structured Streaming query's position IS its
    * checkpoint, so the report reads the checkpoint's commit log (the
    * last batch present under commits/, then that batch's offsets
    * entry) — NOT broker settlement, which by design lags one batch
    * behind the commit (settle fires when the next batch constructs).
    * Works offline: the query need not be running, exactly like
    * describing a stopped consumer group.
    *
    * Scale shape: two tiny checkpoint files + one metadata probe per
    * address, all driver-side — |addresses| rows regardless of backlog
    * depth; no message is fetched or decoded. */
  def lagReport(spark: org.apache.spark.sql.SparkSession, endpoint: String,
      checkpointDir: String): DataFrame = {
    val client = AmqpEndpointRegistry.endpoint(endpoint)
    // Resolve through the Hadoop FileSystem API, as Spark's own
    // checkpoint readers do: a production checkpoint lives on hdfs://
    // or s3a://, where java.io.File would list nothing and mis-report
    // "no committed batches".
    val hconf = spark.sessionState.newHadoopConf()
    val commitsPath = new org.apache.hadoop.fs.Path(s"$checkpointDir/commits")
    val fs = commitsPath.getFileSystem(hconf)
    require(fs.exists(commitsPath),
      s"checkpoint has no commits/ directory at $commitsPath — " +
        "not a Structured Streaming checkpoint, or not yet committed")
    val batchIds = fs.listStatus(commitsPath).toSeq
      .map(_.getPath.getName).filter(f => f.nonEmpty && f.forall(_.isDigit))
      .map(_.toLong)
    require(batchIds.nonEmpty, s"no committed batches under $checkpointDir")
    val lastBatch = batchIds.max
    val in = fs.open(new org.apache.hadoop.fs.Path(s"$checkpointDir/offsets/$lastBatch"))
    val offsetLines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    // v1 offset log: line 0 = version, line 1 = batch metadata, then ONE
    // offset JSON line per source. This report describes exactly one
    // AMQP source; a multi-source query (a union, or an AMQP + Kafka
    // join) has per-source lines this single-endpoint probe cannot
    // attribute — refuse loudly rather than report a subset's lag.
    val sourceLines = offsetLines.drop(2).filter(_.nonEmpty)
    require(sourceLines.size == 1,
      s"lagReport supports single-source checkpoints; batch $lastBatch has " +
        s"${sourceLines.size} source offsets — point it at a query with one AMQP source")
    val off = AmqpOffset.fromJson(sourceLines.head.trim, "")
    val rows = off.seqs.toSeq.sortBy(_._1).map { case (a, committed) =>
      val head = client.latestSeq(a)
      LagRow(a, head, committed, head - committed)
    }
    spark.createDataFrame(rows)
  }

  case class GroupLagRow(address: String, group: String, head_seq: Long,
      dispatched_up_to: Long, undispatched: Long, outstanding_claims: Long,
      outstanding_rows: Long, redeliverable_rows: Long, remaining: Long)

  /** SHARE-GROUP lag report — [[lagReport]]'s work-sharing sibling
    * (Kafka `kafka-consumer-groups --describe` for a group, not one
    * member): per address, one atomic snapshot of the group's dispatch
    * ledger — head vs dispatch frontier (undispatched backlog), live
    * claims (rows leased to running consumers), and redeliverable rows
    * (dead consumers' slices awaiting a new owner). `remaining` is the
    * group's total unfinished work: undispatched + leased + awaiting
    * redelivery. Works offline and against any consumer population —
    * the ledger, not a checkpoint, is the source of truth here, because
    * a share group's position is collectively owned.
    *
    * Scale shape: one ledger-snapshot RPC per address, driver-side —
    * \|addresses\| rows regardless of backlog depth; nothing fetched. */
  def sharedLagReport(spark: org.apache.spark.sql.SparkSession, endpoint: String,
      addresses: Seq[String], group: String): DataFrame = {
    val client = AmqpEndpointRegistry.endpoint(endpoint)
    val rows = addresses.sorted.map { a =>
      val st = client.groupStats(a, group)
      GroupLagRow(a, group, st.headSeq, st.dispatchedUpTo,
        st.headSeq - st.dispatchedUpTo, st.outstandingClaims,
        st.outstandingRows, st.redeliverableRows,
        st.headSeq - st.dispatchedUpTo + st.outstandingRows + st.redeliverableRows)
    }
    spark.createDataFrame(rows)
  }

  case class LeaderboardUpdate(key: String, top: Seq[Int])

  /** Streaming TOP-K LEADERBOARD on `transformWithState` LIST state:
    * per key, maintain the k largest values seen so far and emit the
    * refreshed board whenever it changes — the live-ranking shape
    * (largest orders per priority, hottest items per category) that
    * needs MULTI-VALUE state, which is what distinguishes ListState
    * from the single-register ValueState the running-max changelog
    * uses. State per key is a bounded k-element list in RocksDB; an
    * arrival below the current floor touches state but emits nothing.
    *
    * Scale shape: per-key state is k ints regardless of stream length;
    * each batch shuffles only (key, value) pairs; emissions are
    * change-driven, so a saturated board goes quiet. */
  def topKLeaderboardTws(envelope: DataFrame, keyCol: String, valueCol: String,
      k: Int): Dataset[LeaderboardUpdate] = {
    import envelope.sparkSession.implicits._
    envelope.selectExpr(s"$keyCol AS key", s"CAST($valueCol AS INT) AS value")
      .as[Reading]
      .groupByKey(_.key)
      .transformWithState(new LeaderboardProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }

  case class KeySub(key: String, sub: String)
  case class DistinctUpdate(key: String, distinct_count: Long)

  /** Streaming EXACT DISTINCT-COUNT on `transformWithState` MAP state:
    * per key, the count of distinct sub-keys seen so far (live distinct
    * users per event type), emitted whenever it grows. MapState is the
    * point — membership probes against per-key sub-key registers
    * (containsKey is a point lookup in RocksDB) where ListState would
    * scan and ValueState could hold only a scalar; with Value, List and
    * Map state plus event-time timers, the operator family now
    * exercises every typed state variable the new API offers.
    *
    * Scale shape: state is one map entry per LIVE (key, sub-key) pair —
    * the exact-register cost of exact distinct; at 100 TB cardinality
    * one swaps the map for a mergeable sketch (q29's HLL territory)
    * and keeps this exact form as the audit. */
  def distinctCountTws(envelope: DataFrame, keyCol: String,
      subKeyCol: String): Dataset[DistinctUpdate] = {
    import envelope.sparkSession.implicits._
    envelope.selectExpr(s"$keyCol AS key", s"CAST($subKeyCol AS STRING) AS sub")
      .as[KeySub]
      .groupByKey(_.key)
      .transformWithState(new DistinctCountProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  private class DistinctCountProcessor
      extends StatefulProcessor[String, KeySub, DistinctUpdate] {
    @transient private var seen: MapState[String, Boolean] = _
    @transient private var n: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getMapState[String, Boolean]("seen",
        Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: String, rows: Iterator[KeySub],
        timerValues: TimerValues): Iterator[DistinctUpdate] = {
      var count = if (n.exists()) n.get() else 0L
      var grew = false
      rows.foreach { r =>
        if (!seen.containsKey(r.sub)) {
          seen.updateValue(r.sub, true)
          count += 1
          grew = true
        }
      }
      if (!grew) Iterator.empty
      else {
        n.update(count)
        Iterator(DistinctUpdate(key, count))
      }
    }
  }

  private class LeaderboardProcessor(k: Int)
      extends StatefulProcessor[String, Reading, LeaderboardUpdate] {
    @transient private var topState: ListState[Int] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      topState = getHandle.getListState[Int]("top", Encoders.scalaInt, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[Reading],
        timerValues: TimerValues): Iterator[LeaderboardUpdate] = {
      val prev = topState.get().toSeq
      val merged = (prev ++ rows.map(_.value)).sorted(Ordering[Int].reverse).take(k)
      if (merged == prev) Iterator.empty
      else {
        topState.put(merged.toArray)
        Iterator(LeaderboardUpdate(key, merged))
      }
    }
  }

  case class IdRow(id: String)
  case class TtlDedupEmit(message_id: String)

  /** TTL'd DEDUP REGISTER — the forever-running pipeline's dedup shape:
    * each message id is admitted once, then suppressed while its state
    * register lives, and RE-ADMITTED once the register's TTL evicts it.
    * Where [[dedupByMessageId]] bounds state by the EVENT-TIME watermark
    * (right for replay storms ordered by event time), this bounds it by
    * PROCESSING-TIME TTL — the `transformWithState` capability SURVEY
    * §2.3 sells as the API's 100 TB virtue: a pipeline that runs for
    * months cannot hold every id forever, and a TTL'd register costs
    * state proportional to ids seen within the TTL window, regardless of
    * stream age or event-time skew.
    *
    * Semantics: a copy arriving within `ttl` of the id's last ADMISSION
    * is dropped (duplicates do NOT refresh the register — admission-time
    * anchored, so a duplicate storm cannot extend suppression forever);
    * a copy arriving after eviction is emitted again. In-batch copies of
    * one id collapse in a single `handleInputRows` call.
    *
    * Scale shape: one boolean register per live id in RocksDB, evicted
    * by the store's native TTL machinery (lazy filtering on read +
    * compaction cleanup) — no timer per key, no scan per batch. */
  def dedupByIdTtlTws(envelope: DataFrame, ttl: java.time.Duration): Dataset[TtlDedupEmit] = {
    implicit val ie = Encoders.product[IdRow]
    implicit val oe = Encoders.product[TtlDedupEmit]
    implicit val se = Encoders.STRING
    envelope.selectExpr("message_id AS id")
      .as[IdRow]
      .groupByKey(_.id)
      .transformWithState(new TtlDedupProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  private class TtlDedupProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[String, IdRow, TtlDedupEmit] {
    @transient private var seen: ValueState[Boolean] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      // the one state variable in the streaming layer with a LIVE
      // TTLConfig: exists() returns false once the TTL lapses, which IS
      // the re-admission path the gate drives across a real wall-clock
      // expiry (every other variable passes TTLConfig.NONE by design —
      // their operators' state is bounded by watermark or by k)
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean,
        TTLConfig(ttl))
    override def handleInputRows(key: String, rows: Iterator[IdRow],
        timerValues: TimerValues): Iterator[TtlDedupEmit] =
      if (seen.exists()) Iterator.empty // live register: duplicate, drop
      else {
        seen.update(true) // admit and arm the TTL'd register
        Iterator.single(TtlDedupEmit(key))
      }
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
