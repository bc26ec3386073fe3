package graft.streaming

import java.nio.file.Files

import scala.concurrent.duration._

import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.SparkSpecBase

/** End-to-end tests of the DSv2 AMQP source, mirroring the reference's
  * integration suites: point-to-point completeness
  * (AMQPServerStreamSuite.scala:66-96 — 10 messages, count == 10), the
  * flagship windowed-max query (AMQPTemperature.scala:97), flow-control
  * window behavior, and settle-on-commit / replay semantics.
  *
  * Two engine behaviors these tests account for:
  *  - like the reference's suites (Eventually 10s/1s,
  *    AMQPBrokerStreamSuite.scala:95) post-send assertions poll — a send
  *    can land mid-trigger;
  *  - Spark commits batch N's offsets (→ our settle) while constructing
  *    batch N+1, so settlement assertions follow a nudge message.
  *
  * Counts poll `collect().length`, not `count()`: Spark 4.1's memory
  * sink can serve a STALE count() while the sink mutates under AQE
  * (observed: collect() returns 15 rows while count() stays 10 in the
  * same millisecond) — collect() is always consistent.
  */
class AmqpSourceSpec extends SparkSpecBase {

  private def poll[T](f: => T): T =
    eventually(timeout(30.seconds), interval(500.millis))(f)

  private def freshEndpoint(name: String): (String, InMemoryAmqpBroker) = {
    val ep = s"mem://$name"
    AmqpEndpointRegistry.reset(ep)
    (ep, AmqpEndpointRegistry.broker(ep))
  }

  private def stream(ep: String) =
    spark.readStream.format("amqp")
      .option("endpoint", ep).option("address", "my_address").load()

  private def tableSize(name: String): Long = spark.table(name).collect().length.toLong

  test("point-to-point completeness: 10 sent, 10 received (server suite parity)") {
    val (ep, broker) = freshEndpoint("p2p")
    (1 to 10).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"msg-$i"))))
    val q = stream(ep).select(AmqpConverters.amqpBody.as("b"))
      .writeStream.format("memory").queryName("amqp_p2p").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("amqp_p2p").collect().map(_.getString(0)).toSet
      assert(got == (1 to 10).map(i => s"msg-$i").toSet)
      // continued delivery across triggers
      (11 to 15).foreach(i =>
        broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"msg-$i"))))
      poll { assert(tableSize("amqp_p2p") == 15) }
      // settlement lags one batch: a nudge message forces batch N+1,
      // whose construction commits (settles) everything up to 15
      broker.send("my_address", AmqpMessage(body = AmqpValueBody("nudge")))
      poll {
        assert(tableSize("amqp_p2p") == 16)
        assert(broker.settledUpTo("my_address") >= 15)
      }
    } finally q.stop()
  }

  test("flagship query: 5s tumbling window max over temperatures") {
    val (ep, broker) = freshEndpoint("temps")
    // temperatures 20..24 at 1s spacing, two 5s windows starting at t=100s
    val base = 100L * 1000000L
    for (i <- 0 until 10)
      broker.send("my_address",
        AmqpMessage(body = AmqpValueBody((20 + i % 5).toString)),
        timestampMicros = base + i * 1000000L)
    val q = stream(ep)
      .select(AmqpConverters.amqpBodyAs(IntegerType).as("temperature"),
        col("ingest_timestamp"))
      .withWatermark("ingest_timestamp", "10 seconds")
      .groupBy(window(col("ingest_timestamp"), "5 seconds"))
      .agg(max(col("temperature")).as("max_temperature"))
      .writeStream.format("memory").queryName("amqp_temps").outputMode("complete").start()
    try {
      q.processAllAvailable()
      poll {
        val rows = spark.table("amqp_temps")
          .select(col("window.start").cast("long"), col("max_temperature"))
          .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
        assert(rows == Map(100L -> 24, 105L -> 24))
      }
    } finally q.stop()
  }

  test("sliding window: 10s window, 5s slide (same API family as the tumbling demo)") {
    val (ep, broker) = freshEndpoint("slide")
    val base = 100L * 1000000L
    for (i <- 0 until 10) // temps 20..24 cycling, 1s apart: t=100..109
      broker.send("my_address",
        AmqpMessage(body = AmqpValueBody((20 + i % 5).toString)),
        timestampMicros = base + i * 1000000L)
    val q = stream(ep)
      .select(AmqpConverters.amqpBodyAs(IntegerType).as("t"), col("ingest_timestamp"))
      .withWatermark("ingest_timestamp", "10 seconds")
      .groupBy(window(col("ingest_timestamp"), "10 seconds", "5 seconds"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("amqp_slide").outputMode("complete").start()
    try {
      q.processAllAvailable()
      poll {
        val rows = spark.table("amqp_slide")
          .select(col("window.start").cast("long"), col("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        // events span [100,110): window 95-105 sees 5, 100-110 sees all
        // 10, 105-115 sees the last 5
        assert(rows == Map(95L -> 5L, 100L -> 10L, 105L -> 5L))
      }
    } finally q.stop()
  }

  test("session window: gap-based sessions over the event stream") {
    val (ep, broker) = freshEndpoint("session")
    val base = 100L * 1000000L
    // two bursts separated by >5s: [100,101,102] and [120,121]
    Seq(0L, 1L, 2L, 20L, 21L).foreach(s =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody("x")),
        timestampMicros = base + s * 1000000L))
    val q = stream(ep)
      .select(AmqpConverters.amqpBody.as("k"), col("ingest_timestamp"))
      .withWatermark("ingest_timestamp", "30 seconds")
      // session windows require a grouping key (global session agg is
      // unsupported) — the body is the natural per-device/stream key
      .groupBy(col("k"), session_window(col("ingest_timestamp"), "5 seconds"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("amqp_sess").outputMode("complete").start()
    try {
      q.processAllAvailable()
      poll {
        val rows = spark.table("amqp_sess")
          .select(col("session_window.start").cast("long"), col("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(rows == Map(100L -> 3L, 120L -> 2L))
      }
    } finally q.stop()
  }

  test("credit window bounds the sender; consumption re-opens it") {
    val (ep, broker) = freshEndpoint("credits")
    val sent = (1 to 1200).map(_ =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody("x"))))
    assert(sent.count(_ > 0) == 1000, "in-flight window = CREDITS_DEFAULT")
    assert(sent.count(_ == -1) == 200, "overflow refused, not dropped silently")
    assert(broker.inFlightCount("my_address") == 1000)
    // consumption (delivery to Spark) frees the window — settlement
    // lag must NOT block producers (liveness)
    val q = stream(ep).writeStream.format("memory")
      .queryName("amqp_credits").outputMode("append").start()
    try {
      q.processAllAvailable()
      poll { assert(broker.inFlightCount("my_address") == 0) }
      assert(broker.send("my_address", AmqpMessage(body = AmqpValueBody("y"))) > 0)
      // ...and the nudge's batch construction settles the first 1000
      poll { assert(broker.settledUpTo("my_address") >= 1000) }
    } finally q.stop()
    // credit re-issue bookkeeping advanced in 50% steps
    assert(broker.flowController("my_address").totalIssued >= 1500)
  }

  test("maxMessagesPerTrigger caps each micro-batch") {
    val (ep, broker) = freshEndpoint("admission")
    (1 to 10).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"$i"))))
    val q = spark.readStream.format("amqp")
      .option("endpoint", ep).option("address", "my_address")
      .option("maxMessagesPerTrigger", "3").load()
      .writeStream.format("memory").queryName("amqp_adm").outputMode("append").start()
    try {
      q.processAllAvailable()
      poll { assert(tableSize("amqp_adm") == 10) }
      val batchSizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(batchSizes.nonEmpty && batchSizes.forall(_ <= 3),
        s"batches: ${batchSizes.mkString(",")}")
    } finally q.stop()
  }

  test("minMessagesPerTrigger holds sub-floor batches; maxTriggerDelay fires them (unit)") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val (ep, broker) = freshEndpoint("minrows")
    val stream = new AmqpMicroBatchStream(
      AmqpSourceConfig(ep, "my_address", Seq("my_address"),
        maxPerTrigger = 100, maxPerSecond = 0,
        minPerTrigger = 5, maxTriggerDelayMillis = 10000))
    var now = 1000L
    stream.wallClock = () => now
    // the composite default limit carries BOTH bounds, Kafka-shaped
    val limit = stream.getDefaultReadLimit
    def admit(from: Long): Long =
      stream.latestOffset(AmqpOffset.single("my_address", from), limit)
        .asInstanceOf[AmqpOffset].seqOf("my_address")
    // 3 rows < floor of 5, inside the delay window: NO batch (the same
    // offset back), however often the trigger polls
    (1 to 3).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"$i"))))
    now += 2000; assert(admit(0) == 0, "below the floor: hold")
    now += 2000; assert(admit(0) == 0, "still below, still inside the window")
    // more data reaches the floor: fires immediately
    (4 to 6).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"$i"))))
    assert(admit(0) == 6, "floor reached: admit everything available")
    // a trickle below the floor waits out the ceiling, then fires
    broker.send("my_address", AmqpMessage(body = AmqpValueBody("7")))
    now += 9000; assert(admit(6) == 6, "1 row, 9s of 10s window: hold")
    now += 2000; assert(admit(6) == 7, "delay ceiling reached: fire below the floor")
    // the ceiling re-anchors at the admitted batch
    broker.send("my_address", AmqpMessage(body = AmqpValueBody("8")))
    now += 5000; assert(admit(7) == 7, "window re-anchored: hold again")
    // an AvailableNow run ignores the floor (drain-and-stop must not hang)
    stream.prepareForTriggerAvailableNow()
    assert(admit(7) == 8, "AvailableNow drains regardless of the floor")
  }

  test("minMessagesPerTrigger batches a trickle stream end to end") {
    val (ep, broker) = freshEndpoint("minrows-e2e")
    (1 to 12).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"$i"))))
    val q = spark.readStream.format("amqp")
      .option("endpoint", ep).option("address", "my_address")
      .option("minMessagesPerTrigger", "4")
      .option("maxTriggerDelay", "1s")
      .load()
      .writeStream.format("memory").queryName("amqp_minrows").outputMode("append").start()
    try {
      q.processAllAvailable()
      poll { assert(tableSize("amqp_minrows") == 12) }
      // every admitted batch carried at least the floor (a per-row
      // trigger would show 1-row batches)
      val batchSizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(batchSizes.nonEmpty && batchSizes.forall(_ >= 4),
        s"batches: ${batchSizes.mkString(",")}")
      // a 2-row trickle is BELOW the floor: it fires anyway once the 1s
      // delay ceiling lapses (bounded staleness, not a hang)
      (13 to 14).foreach(i =>
        broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"$i"))))
      poll { assert(tableSize("amqp_minrows") == 14) }
    } finally q.stop()
    // maxTriggerDelay without a min refuses loudly
    intercept[IllegalArgumentException] {
      spark.readStream.format("amqp")
        .option("endpoint", ep).option("address", "my_address")
        .option("maxTriggerDelay", "5s").load()
    }
  }

  test("progress reports source metrics: backlog, unsettled window, links") {
    val (ep, broker) = freshEndpoint("metrics")
    (1 to 8).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"$i"))))
    val q = stream(ep).select(col("body"))
      .writeStream.format("memory").queryName("amqp_metrics").outputMode("append").start()
    try {
      q.processAllAvailable()
      poll {
        val m = q.lastProgress.sources.head.metrics
        assert(m.containsKey("backlogMessages") && m.containsKey("unsettledMessages"),
          s"metrics: $m")
        assert(m.get("links") == "1")
        assert(m.get("backlogMessages").toLong == 0L, s"drained stream, got $m")
      }
    } finally q.stop()
  }

  test("uncapped ReadLimit with a non-zero start does not wrap the end offset") {
    // Trigger.Once passes ReadAllAvailable → per-link budget
    // Long.MaxValue; a wrapped (startSeq + budget) would move the end
    // offset BACKWARD (negative), admitting nothing and checkpointing a
    // corrupt offset. The sum must saturate instead.
    val (ep, broker) = freshEndpoint("nolimit")
    (1 to 10).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"$i"))))
    val stream = new AmqpMicroBatchStream(
      AmqpSourceConfig(ep, "my_address", Seq("my_address"),
        maxPerTrigger = 10000, maxPerSecond = 0))
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val end = stream
      .latestOffset(AmqpOffset.single("my_address", 5), ReadLimit.allAvailable())
      .asInstanceOf[AmqpOffset].seqOf("my_address")
    assert(end == 10, s"end offset must be the live tail, got $end")
  }

  test("metrics survives a SerializedOffset (crash-recovery replay path)") {
    // After a crash between the offset-log and commit-log writes, Spark
    // re-executes the uncommitted batch and populateStartOffsets feeds
    // finishTrigger's metrics() the WAL-restored offset as a
    // SerializedOffset, not an AmqpOffset — a blind cast would kill the
    // restarted query exactly on the replay path the reliable-source
    // contract exists for (the Kafka source guards the same case).
    val (ep, broker) = freshEndpoint("serialized-offset")
    (1 to 8).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"$i"))))
    val stream = new AmqpMicroBatchStream(
      AmqpSourceConfig(ep, "my_address", Seq("my_address"),
        maxPerTrigger = 10000, maxPerSecond = 0))
    val walForm = new org.apache.spark.sql.execution.streaming.runtime.SerializedOffset(
      AmqpOffset.single("my_address", 5L).json())
    val m = stream.metrics(java.util.Optional.of(walForm))
    assert(m.get("backlogMessages") == "3", s"metrics: $m")
    assert(m.get("links") == "1")
  }

  test("maxMessagesPerSecond admission: budget = rate x elapsed, burst-capped") {
    val (ep, broker) = freshEndpoint("rate")
    (1 to 1000).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"$i"))))
    val stream = new AmqpMicroBatchStream(
      AmqpSourceConfig(ep, "my_address", Seq("my_address"),
        maxPerTrigger = 10000, maxPerSecond = 100))
    var now = 0L
    stream.nanoClock = () => now
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    def admit(from: Long): Long =
      stream.latestOffset(AmqpOffset.single("my_address", from), ReadLimit.maxRows(10000))
        .asInstanceOf[AmqpOffset].seqOf("my_address")
    // first trigger: one second's worth
    assert(admit(0) == 100)
    // 500ms later: half a second's budget
    now += 500L * 1000 * 1000
    assert(admit(100) == 150)
    // a long stall does not bank unbounded budget (burst ceiling 10x)
    now += 3600L * 1000 * 1000 * 1000
    assert(admit(150) == 1000, "10x burst cap > remaining data")
    // trigger cap still wins when smaller
    now += 1000L * 1000 * 1000
    val cappedByTrigger = stream
      .latestOffset(AmqpOffset.single("my_address", 0), ReadLimit.maxRows(7))
      .asInstanceOf[AmqpOffset].seqOf("my_address")
    assert(cappedByTrigger == 7)
  }

  test("offsets checkpoint across restarts; no duplicates of the settled prefix") {
    val (ep, broker) = freshEndpoint("restart")
    val ckpt = Files.createTempDirectory("amqp-ckpt").toString
    val out = Files.createTempDirectory("amqp-out").toString
    def run(): Unit = {
      val q = stream(ep).select(AmqpConverters.amqpBody.as("b"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    (1 to 10).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"a$i"))))
    run()
    assert(spark.read.parquet(out).count() == 10)
    (11 to 15).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"a$i"))))
    run()
    // offsets came from the checkpoint: exactly the tail was appended
    val got = spark.read.parquet(out).collect().map(_.getString(0)).toSet
    assert(got == (1 to 15).map(i => s"a$i").toSet)
    assert(spark.read.parquet(out).count() == 15)
  }

  test("failOnDataLoss: a restart below the settlement prefix fails loudly; =false skips the gap") {
    val (ep, broker) = freshEndpoint("dataloss")
    val ckpt = Files.createTempDirectory("amqp-loss-ckpt").toString
    val out = Files.createTempDirectory("amqp-loss-out").toString
    def run(extra: Map[String, String]): Unit = {
      var rdr = spark.readStream.format("amqp")
        .option("endpoint", ep).option("address", "my_address")
      extra.foreach { case (k, v) => rdr = rdr.option(k, v) }
      val q = rdr.load().select(AmqpConverters.amqpBody.as("b"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    (1 to 5).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"a$i"))))
    run(Map.empty) // committed position: 5
    assert(spark.read.parquet(out).count() == 5)
    (6 to 10).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"a$i"))))
    // a competing consumer settles past our checkpoint: (5, 8] is gone
    broker.settle("my_address", 8)
    val ex = intercept[Exception] { run(Map.empty) } // default: fail loudly
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("data loss on 'my_address'")),
      s"expected a data-loss failure, got: $ex")
    assert(spark.read.parquet(out).count() == 5, "failing run wrote nothing")
    // opt-in skip: resume from the prefix, deliver only what survives
    run(Map("failOnDataLoss" -> "false"))
    val got = spark.read.parquet(out).collect().map(_.getString(0)).toSet
    assert(got == (1 to 5).map(i => s"a$i").toSet ++ Set("a9", "a10"),
      s"skip path should append exactly the surviving tail, got $got")
    // a FRESH query (new checkpoint) on the same partially-settled
    // address must NOT trip the check — Kafka parity: a new consumer
    // resolves its start to the actual log start (the replayable
    // prefix), never to positions that predate it
    val ckpt2 = Files.createTempDirectory("amqp-loss-ckpt2").toString
    val out2 = Files.createTempDirectory("amqp-loss-out2").toString
    val q2 = spark.readStream.format("amqp")
      .option("endpoint", ep).option("address", "my_address").load()
      .select(AmqpConverters.amqpBody.as("b"))
      .writeStream.format("parquet")
      .option("path", out2).option("checkpointLocation", ckpt2)
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    val fresh = spark.read.parquet(out2).collect().map(_.getString(0)).toSet
    assert(fresh == Set("a9", "a10"),
      s"fresh query reads exactly the unsettled suffix, got $fresh")
  }

  test("startingSequence positions a new query; below-prefix starts ride failOnDataLoss; checkpoints win on restart") {
    val (ep, broker) = freshEndpoint("from-seq")
    (1 to 10).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"a$i"))))
    val out = Files.createTempDirectory("from-seq-out").toString
    val ckpt = Files.createTempDirectory("from-seq-ckpt").toString
    def run(extra: Map[String, String]): Unit = {
      var rdr = spark.readStream.format("amqp")
        .option("endpoint", ep).option("address", "my_address")
        .option("startingSequence", "4")
      extra.foreach { case (k, v) => rdr = rdr.option(k, v) }
      val q = rdr.load().select(AmqpConverters.amqpBody.as("b"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run(Map.empty)
    assert(spark.read.parquet(out).collect().map(_.getString(0)).toSet
      == (5 to 10).map(i => s"a$i").toSet, "exclusive position: exactly the suffix")
    // a RESTART replays from the checkpoint — the anchor is ignored
    // (Kafka contract), so only genuinely new messages append
    (11 to 12).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"a$i"))))
    run(Map.empty)
    assert(spark.read.parquet(out).collect().map(_.getString(0)).toSet
      == (5 to 12).map(i => s"a$i").toSet)
    // a position below the settlement prefix is a lost-data start: the
    // same failOnDataLoss contract as a stale checkpoint. The prior
    // consuming runs already settled their committed prefix (at least
    // batch-lagged to 10), so the floor is above the anchor either way.
    broker.settle("my_address", 8)
    val floor = broker.settledUpTo("my_address")
    assert(floor > 4 && floor <= 12, s"scenario needs floor above the anchor: $floor")
    val ckpt2 = Files.createTempDirectory("from-seq-ckpt2").toString
    val out2 = Files.createTempDirectory("from-seq-out2").toString
    def freshRun(fail: String): Unit = {
      val q = spark.readStream.format("amqp")
        .option("endpoint", ep).option("address", "my_address")
        .option("startingSequence", "4").option("failOnDataLoss", fail)
        .load().select(AmqpConverters.amqpBody.as("b"))
        .writeStream.format("parquet")
        .option("path", out2).option("checkpointLocation", ckpt2)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    val ex = intercept[Exception](freshRun("true"))
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => String.valueOf(c.getMessage).contains("data loss")),
      s"below-prefix start must report loss, got $ex")
    freshRun("false") // opt-in skip: exactly the surviving tail
    assert(spark.read.parquet(out2).collect().map(_.getString(0)).toSet
      == (floor.toInt + 1 to 12).map(i => s"a$i").toSet)
    // the two anchors are mutually exclusive
    intercept[IllegalArgumentException] {
      spark.readStream.format("amqp")
        .option("endpoint", ep).option("address", "my_address")
        .option("startingSequence", "4")
        .option("startingTimestampMicros", "1").load()
    }
    // endingSequence bounds BATCH windows; a streaming query refuses it
    val boundedCfg = AmqpSourceConfig(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("endpoint", ep, "address", "my_address", "endingSequence", "6")))
    intercept[IllegalArgumentException](
      new AmqpScan(boundedCfg).toMicroBatchStream("/tmp/ending-seq-refuse"))
    // and the batch window is exact at both cuts (start exclusive, end
    // inclusive), indifferent to backlog on either side — on a fresh
    // endpoint (this test's first endpoint has a settled prefix by now)
    val (ep3, broker3) = freshEndpoint("window-batch")
    (1 to 10).foreach(i =>
      broker3.send("my_address", AmqpMessage(body = AmqpValueBody(s"a$i"))))
    val win = spark.read.format("amqp")
      .option("endpoint", ep3).option("address", "my_address")
      .option("startingSequence", "2").option("endingSequence", "6")
      .load().select(AmqpConverters.amqpBody.as("b"))
      .collect().map(_.getString(0)).toSet
    assert(win == (3 to 6).map(i => s"a$i").toSet, s"window (2, 6]: $win")
  }

  test("browse mode is exempt from failOnDataLoss: a lagging peek behind the real consumer skips, never throws") {
    // The browse contract: any number of peeking queries ride behind the
    // address's real "move" consumer, whose settlement ROUTINELY
    // overtakes their checkpoints. That is not data loss — with the
    // default failOnDataLoss=true a lagging browse must skip to the
    // prefix silently (the move-mode sibling test above asserts the
    // throw for the same shape).
    val (ep, broker) = freshEndpoint("browse-lag")
    val ckpt = Files.createTempDirectory("amqp-browse-lag-ckpt").toString
    val out = Files.createTempDirectory("amqp-browse-lag-out").toString
    def run(): Unit = {
      val q = spark.readStream.format("amqp")
        .option("endpoint", ep).option("address", "my_address")
        .option("browse", "true").load()
        .select(AmqpConverters.amqpBody.as("b"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    (1 to 5).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"a$i"))))
    run() // browse checkpoints position 5, settles nothing
    assert(spark.read.parquet(out).count() == 5)
    assert(broker.settledUpTo("my_address") == 0L, "a browse never settles")
    (6 to 10).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"a$i"))))
    // the real consumer settles past the browse's checkpoint
    broker.settle("my_address", 8)
    run() // default failOnDataLoss=true — must NOT throw in browse mode
    val got = spark.read.parquet(out).collect().map(_.getString(0)).toSet
    assert(got == (1 to 5).map(i => s"a$i").toSet ++ Set("a9", "a10"),
      s"lagging browse resumes at the prefix and reads the survivors, got $got")
  }

  test("windowed-agg STATE survives a restart (WAL + getOrCreate parity)") {
    // The reference's recovery story is StreamingContext.getOrCreate over
    // a checkpoint (AMQPTemperature.scala:61) with the receiver WAL: after
    // a driver restart, in-flight window state resumes. Structured
    // Streaming equivalent: the window aggregate's partial state lives in
    // the state store under checkpointLocation. This test feeds half a
    // window, bounces the query, feeds the other half plus a
    // watermark-advancing nudge, and asserts the finalized window max
    // combines values from BOTH sides of the restart.
    val (ep, broker) = freshEndpoint("restart-state")
    val ckpt = Files.createTempDirectory("amqp-state-ckpt").toString
    val out = Files.createTempDirectory("amqp-state-out").toString
    val base = 1000L * 1000000L // t=1000s
    def send(temp: Int, atSec: Long): Unit =
      broker.send("my_address",
        AmqpMessage(body = AmqpValueBody(temp.toString)),
        timestampMicros = base + atSec * 1000000L)
    def run(): Unit = {
      val q = stream(ep)
        .select(AmqpConverters.amqpBodyAs(IntegerType).as("t"),
          col("ingest_timestamp"))
        .withWatermark("ingest_timestamp", "1 second")
        .groupBy(window(col("ingest_timestamp"), "5 seconds"))
        .agg(org.apache.spark.sql.functions.max(col("t")).as("max_t"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    send(21, 0); send(24, 1) // first half of the [1000,1005) window
    run()                    // restart boundary: state must persist
    send(22, 3); send(23, 4) // second half — lower than the pre-restart max
    send(0, 30)              // watermark nudge: finalizes the window
    run()
    val finalized = spark.read.parquet(out)
      .select(col("window.start").cast("long"), col("max_t"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(finalized.get(1000L).contains(24),
      s"window max must combine state across the restart: $finalized")
  }

  test("throughput: sustained end-to-end rate through one link (BASELINE 10k msg/s target)") {
    // BASELINE.md's only quantitative target: >= 10,000 msg/s per link
    // (the reference's implied design ceiling). Two measurements:
    //  1. reader-path cost: batch-read a preloaded backlog (producer
    //     advances the credit window by consuming its own deliveries
    //     via fetch, which is what re-issues credit);
    //  2. live end-to-end: producer thread + streaming query, credit
    //     window active. Micro-batch scheduling dominates (2), so the
    //     assertion floor is conservative; measured rates are printed
    //     for the record.
    val n = 40000
    val (ep, broker) = freshEndpoint("tput")
    var preloaded = 0L
    val t0 = System.nanoTime()
    var fetchedUpTo = 0L
    while (preloaded < n) {
      if (broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"m-$preloaded")),
          timestampMicros = preloaded * 1000L) >= 0) preloaded += 1
      else { // window full: consume the pending slice to re-open credit
        val to = broker.latestSeq("my_address")
        broker.fetch("my_address", fetchedUpTo, to)
        fetchedUpTo = to
      }
    }
    val tSend = System.nanoTime()
    val df = spark.read.format("amqp")
      .option("endpoint", ep).option("address", "my_address").load()
    assert(df.count() == n) // warm: planning + codegen + classloading
    val t1 = System.nanoTime()
    assert(df.count() == n)
    val batchRate = n / ((System.nanoTime() - t1) / 1e9)
    info(f"batch reader path: $batchRate%.0f msg/s over $n messages " +
      f"(preload ${n / ((tSend - t0) / 1e9)}%.0f msg/s, " +
      f"cold first read ${n / ((t1 - tSend) / 1e9)}%.0f msg/s)")
    assert(batchRate > 10000, f"reader path $batchRate%.0f msg/s below the 10k target")

    // live: fresh endpoint, producer thread racing the stream
    val (ep2, broker2) = freshEndpoint("tput-live")
    val live = 20000
    val q = spark.readStream.format("amqp")
      .option("endpoint", ep2).option("address", "my_address").load()
      .select(col("body"))
      .writeStream.format("memory").queryName("amqp_tput").outputMode("append").start()
    val t2 = System.nanoTime()
    val producer = new Thread(() => {
      var sent = 0
      while (sent < live) {
        if (broker2.send("my_address", AmqpMessage(body = AmqpValueBody(s"l-$sent")),
            timestampMicros = sent * 1000L) >= 0) sent += 1
        else Thread.`yield`() // window full: wait for the reader to drain
      }
    }, "tput-producer")
    producer.start()
    try {
      eventually(timeout(120.seconds), interval(250.millis)) {
        assert(tableSize("amqp_tput") == live)
      }
      val liveRate = live / ((System.nanoTime() - t2) / 1e9)
      info(f"live end-to-end: $liveRate%.0f msg/s over $live messages (credit window 1000)")
      // floor is deliberately far under typical (~3k): host load swings
      // wall-clock 2-4x on this VM and the assertion must not flake
      assert(liveRate > 500, f"live rate $liveRate%.0f msg/s implausibly low")
    } finally { producer.join(2000); q.stop() }
  }

  test("Trigger.AvailableNow drains the snapshot in capped batches, then stops") {
    val (ep, broker) = freshEndpoint("availnow")
    (1 to 25).foreach(i => broker.send("my_address",
      AmqpMessage(body = AmqpValueBody(s"m-$i")), timestampMicros = i * 1000000L))
    val q = spark.readStream.format("amqp")
      .option("endpoint", ep).option("address", "my_address")
      .option("maxMessagesPerTrigger", "10").load()
      .select(AmqpConverters.amqpBody.as("b"))
      .writeStream.format("memory").queryName("amqp_an")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(60000), "AvailableNow query must self-terminate")
      val got = spark.table("amqp_an").collect().map(_.getString(0)).toSet
      assert(got == (1 to 25).map(i => s"m-$i").toSet)
    } finally q.stop()
  }

  test("offset json round-trips; legacy single-link form still parses") {
    val o = AmqpOffset(Map("b" -> 2L, "a" -> 7L))
    assert(o.json() == """{"seqs":{"a":7,"b":2}}""", "sorted keys: equal offsets compare equal")
    assert(AmqpOffset.fromJson(o.json(), "a") == o)
    assert(AmqpOffset.fromJson("""{"seq":5}""", "addr_x") == AmqpOffset.single("addr_x", 5L),
      "pre-multi-link checkpoints resume against the primary address")
    // an address literally named "seqs" must not confuse the parser
    val tricky = AmqpOffset(Map("seqs" -> 3L, "z" -> 1L))
    assert(AmqpOffset.fromJson(tricky.json(), "z") == tricky)
  }

  test("multi-link: one partition per address, per-link offsets and settlement") {
    val (ep, broker) = freshEndpoint("multilink")
    (1 to 6).foreach(i => broker.send("addr_a",
      AmqpMessage(body = AmqpValueBody(s"a-$i")), timestampMicros = i * 1000000L))
    (1 to 4).foreach(i => broker.send("addr_b",
      AmqpMessage(body = AmqpValueBody(s"b-$i")), timestampMicros = i * 1000000L))
    // batch read: one partition per link (the horizontal-scale unit)
    val df = spark.read.format("amqp")
      .option("endpoint", ep).option("addresses", "addr_a, addr_b").load()
    assert(df.rdd.getNumPartitions == 2, "one input partition per link")
    assert(df.count() == 10)
    // streaming: both links drain under one query; commit settles each
    val q = spark.readStream.format("amqp")
      .option("endpoint", ep).option("addresses", "addr_a,addr_b").load()
      .select(AmqpConverters.amqpBody.as("b"))
      .writeStream.format("memory").queryName("amqp_multi").outputMode("append").start()
    try {
      q.processAllAvailable()
      poll {
        val got = spark.table("amqp_multi").collect().map(_.getString(0)).toSet
        assert(got == ((1 to 6).map(i => s"a-$i") ++ (1 to 4).map(i => s"b-$i")).toSet)
      }
      // nudge one link; the next batch's construction commits (settles)
      // BOTH links' delivered prefixes
      broker.send("addr_b", AmqpMessage(body = AmqpValueBody("nudge")),
        timestampMicros = 99 * 1000000L)
      poll {
        assert(tableSize("amqp_multi") == 11)
        assert(broker.settledUpTo("addr_a") >= 6)
        assert(broker.settledUpTo("addr_b") >= 4)
      }
    } finally q.stop()
  }

  test("scan statistics: a small AMQP snapshot broadcasts in a join") {
    import org.apache.spark.sql.functions._
    val (ep, broker) = freshEndpoint("stats")
    (1 to 50).foreach(i =>
      broker.send("my_address", AmqpMessage(messageId = Some(i.toString),
        subject = Some(s"k${i % 5}"), body = AmqpValueBody(i.toString)),
        timestampMicros = i * 1000000L))
    val amqp = spark.read.format("amqp")
      .option("endpoint", ep).option("address", "my_address").load()
      .select(col("subject"), col("body"))
    // without SupportsReportStatistics a DSv2 relation sizes as
    // "unknown = never broadcast"; with it, 50 envelope rows sit far
    // under the 10MB threshold and the planner must broadcast them
    val big = spark.range(0, 100000)
      .select(concat(lit("k"), (col("id") % 5)).as("subject"), col("id"))
    val joined = big.join(amqp, Seq("subject"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(joined.count() == 100000L / 5 * 50)
  }

  test("batch read exposes the replayable window for oracle comparisons") {
    val (ep, broker) = freshEndpoint("batchread")
    (1 to 5).foreach(i =>
      broker.send("my_address", AmqpMessage(
        applicationProperties = Seq("k" -> i),
        body = AmqpValueBody(s"b$i"))))
    val df = spark.read.format("amqp")
      .option("endpoint", ep).option("address", "my_address").load()
    assert(df.count() == 5)
    val r = df.select(AmqpConverters.amqpBody.as("b"),
      element_at(col("application_properties"), "k").as("k")).collect()
    assert(r.map(x => (x.getString(0), x.getString(1))).toSet ==
      (1 to 5).map(i => (s"b$i", s"$i")).toSet)
  }

  test("global COUNT(*) pushes to the scan (SupportsPushDownAggregates)") {
    val (ep, broker) = freshEndpoint("countpush")
    (1 to 7).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"b$i"))))
    broker.settle("my_address", 2) // settled floor must be honored
    val df = spark.read.format("amqp")
      .option("endpoint", ep).option("address", "my_address").load()
    val counted = df.agg(count(lit(1)).as("n"))
    val plan = counted.queryExecution.executedPlan.toString
    // complete pushdown: the metadata scan answers, no row aggregate
    assert(plan.contains("AmqpCountScan"), s"count not pushed:\n$plan")
    assert(!plan.contains("HashAggregate"), s"agg survived pushdown:\n$plan")
    assert(counted.collect().head.getLong(0) == 5L)
    // the pushed answer must equal the row scan's
    assert(df.selectExpr("message_id").collect().length == 5)
    // grouped/other aggregates must NOT push: they need real rows
    val grouped = df.groupBy(col("subject")).agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    assert(!grouped.contains("AmqpCountScan"), grouped)
    assert(grouped.contains("HashAggregate"), grouped)
    // count(col) must NOT push (per-column null semantics) — this is
    // also the exact shape the ingest bench times, so this pin keeps
    // the bench measuring a real row scan, not the ledger probe
    val colCount = df.agg(count(col("body")).as("n"))
    val colPlan = colCount.queryExecution.executedPlan.toString
    assert(!colPlan.contains("AmqpCountScan"), colPlan)
    assert(colPlan.contains("AmqpScan("), colPlan)
    assert(colCount.collect().head.getLong(0) == 5L)
  }

  test("address glob: '*' spans any run, everything else literal (regex metachars inert)") {
    def m(p: String, a: String) = AmqpAddressGlob.regex(p).matcher(a).matches()
    assert(m("sensor-*", "sensor-") && m("sensor-*", "sensor-x/1"))
    assert(!m("sensor-*", "xsensor-a"), "pattern is anchored")
    assert(m("*", "anything"))
    assert(m("a.b", "a.b") && !m("a.b", "axb"), "dot is literal, not regex")
    assert(m("a*b*c", "a-xx-b-yy-c") && !m("a*b*c", "a-c"))
  }

  test("addressPattern: batch read subscribes to every matching queue, decoys excluded") {
    val (ep, broker) = freshEndpoint("patternbatch")
    (1 to 4).foreach(i => broker.send("sensor-a",
      AmqpMessage(messageId = Some(s"a$i"), body = AmqpValueBody("x"))))
    (1 to 3).foreach(i => broker.send("sensor-b",
      AmqpMessage(messageId = Some(s"b$i"), body = AmqpValueBody("x"))))
    (1 to 5).foreach(i => broker.send("audit",
      AmqpMessage(messageId = Some(s"d$i"), body = AmqpValueBody("x"))))
    def read() = spark.read.format("amqp")
      .option("endpoint", ep).option("addressPattern", "sensor-*").load()
    val ids = read().select(col("message_id")).collect().map(_.getString(0)).toSet
    assert(ids == ((1 to 4).map(i => s"a$i") ++ (1 to 3).map(i => s"b$i")).toSet)
    // a bare COUNT(*) answers from the ledger across the DISCOVERED set
    val counted = read().agg(count(lit(1)))
    assert(counted.queryExecution.executedPlan.toString.contains("AmqpCountScan"))
    assert(counted.collect().head.getLong(0) == 7L)
    // pattern and an explicit address list are mutually exclusive
    val e = intercept[Exception] {
      spark.read.format("amqp").option("endpoint", ep)
        .option("addressPattern", "s*").option("addresses", "a,b").load()
    }
    assert(e.getMessage.contains("mutually exclusive"), e.getMessage)
    // a glob has no single write target: writes refuse unless the sink
    // address is NAMED alongside the pattern
    val w = intercept[Exception] {
      spark.range(1).selectExpr("CAST(id AS STRING) AS body")
        .write.format("amqp").option("endpoint", ep)
        .option("addressPattern", "sensor-*").mode("append").save()
    }
    assert(w.getMessage.contains("no single write target"), w.getMessage)
    // ...and proceeds when it is
    spark.range(1).selectExpr("CAST(id AS STRING) AS body")
      .write.format("amqp").option("endpoint", ep)
      .option("addressPattern", "sensor-*").option("address", "sensor-a")
      .mode("append").save()
    assert(read().count() == 8, "the named-target write must land in the subscription")
  }

  test("addressPattern: a queue created mid-stream joins the subscription from its start") {
    val (ep, broker) = freshEndpoint("patternstream")
    (1 to 3).foreach(i => broker.send("evt-a", AmqpMessage(body = AmqpValueBody(s"a$i"))))
    broker.send("other", AmqpMessage(body = AmqpValueBody("decoy")))
    val q = spark.readStream.format("amqp")
      .option("endpoint", ep).option("addressPattern", "evt-*").load()
      .select(AmqpConverters.amqpBody.as("b"))
      .writeStream.format("memory").queryName("amqp_pattern")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("amqp_pattern").collect().map(_.getString(0)).toSet ==
        Set("a1", "a2", "a3"))
      // a NEW matching queue appears mid-stream: the next trigger's
      // discovery probe picks it up and consumes it FROM ITS START
      (1 to 2).foreach(i => broker.send("evt-b", AmqpMessage(body = AmqpValueBody(s"b$i"))))
      broker.send("other", AmqpMessage(body = AmqpValueBody("decoy2")))
      q.processAllAvailable()
      poll {
        assert(spark.table("amqp_pattern").collect().map(_.getString(0)).toSet ==
          Set("a1", "a2", "a3", "b1", "b2"), "discovered queue must drain; decoys never")
      }
    } finally q.stop()
  }

  test("CREATE TABLE ... USING amqp: the SQL-DDL surface resolves through DSv2") {
    val (ep, broker) = freshEndpoint("sqlddl")
    (1 to 6).foreach(i =>
      broker.send("sql_addr", AmqpMessage(messageId = Some(i.toString),
        subject = Some(s"k${i % 2}"), body = AmqpValueBody(s"b$i"))))
    spark.sql("DROP TABLE IF EXISTS amqp_spec_tbl")
    spark.sql(s"CREATE TABLE amqp_spec_tbl USING amqp " +
      s"OPTIONS (endpoint '$ep', address 'sql_addr')")
    try {
      // pure-SQL aggregate over the catalog table
      val agg = spark.sql(
        "SELECT subject, count(*) AS n FROM amqp_spec_tbl GROUP BY subject")
      assert(agg.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
        Set(("k0", 3L), ("k1", 3L)))
      // pushdowns ride the SQL path untouched: a bare COUNT(*) answers
      // from the ledger scan, no row aggregate
      val counted = spark.sql("SELECT count(*) AS n FROM amqp_spec_tbl")
      val plan = counted.queryExecution.executedPlan.toString
      assert(plan.contains("AmqpCountScan"), s"count not pushed through SQL:\n$plan")
      assert(counted.collect().head.getLong(0) == 6L)
      // and predicate pushdown: the WHERE lands in PushedFilters
      val filtered = spark.sql(
        "SELECT message_id FROM amqp_spec_tbl WHERE subject = 'k1'")
      val fplan = filtered.queryExecution.executedPlan.toString
      assert(fplan.contains("PushedFilters"), fplan)
      assert(filtered.collect().map(_.getString(0).toInt).sorted.toSeq == Seq(1, 3, 5))
      // SQL write path: INSERT INTO the catalog table publishes through
      // the exactly-once sink (creation OPTIONS reach the write builder)
      spark.sql("INSERT INTO amqp_spec_tbl (message_id, subject, body) " +
        "VALUES ('7', 'k9', 'b7')")
      val after = spark.sql(
        "SELECT body FROM amqp_spec_tbl WHERE subject = 'k9'").collect()
      assert(after.map(_.getString(0)).toSeq == Seq("b7"), after.mkString(","))
      assert(spark.sql("SELECT count(*) FROM amqp_spec_tbl")
        .collect().head.getLong(0) == 7L)
      // the same catalog identity streams: readStream.table resolves the
      // stored OPTIONS through toMicroBatchStream (last: commits settle)
      val q = spark.readStream.table("amqp_spec_tbl")
        .select(col("message_id"))
        .writeStream.format("memory").queryName("amqp_sql_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(spark.table("amqp_sql_stream").collect().length == 7)
      } finally q.stop()
    } finally spark.sql("DROP TABLE IF EXISTS amqp_spec_tbl")
  }

  test("timestamp + string predicates push to the scan (SupportsPushDownV2Filters)") {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val (ep, broker) = freshEndpoint("predpush")
    // seconds 1..50 as micros; subjects alternate k0/k1
    (1 to 50).foreach(i =>
      broker.send("my_address", AmqpMessage(messageId = Some(i.toString),
        subject = Some(s"k${i % 2}"), body = AmqpValueBody(s"b$i")),
        timestampMicros = i * 1000000L))
    def read() = spark.read.format("amqp")
      .option("endpoint", ep).option("address", "my_address").load()
    val lo = java.time.Instant.ofEpochSecond(10)
    val hi = java.time.Instant.ofEpochSecond(20)
    val filtered = read()
      .where(col("ingest_timestamp") >= lit(lo) && col("ingest_timestamp") <= lit(hi)
        && col("subject") === "k1")
    // exact results: odd seconds in [10, 20]
    assert(filtered.select(col("message_id")).collect().map(_.getString(0).toInt).sorted.toSeq
      == (11 to 19 by 2).toSeq)
    // the scan carries the predicates and Spark plans NO re-filter
    val scan = filtered.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.head
    assert(scan.description().contains("PushedFilters:"), scan.description())
    def filterNodes(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FilterExec => f
      }
    assert(filterNodes(filtered).isEmpty,
      s"pushed predicates must not be re-filtered:\n${filtered.queryExecution.executedPlan}")
    // planning-time pruning: fetch windows span only the covering
    // sequence range (seqs 10..20), not the 50 replayable messages
    val spans = scan.toBatch.planInputPartitions()
      .map(_.asInstanceOf[AmqpInputPartition])
    assert(spans.length == 1, spans.toSeq.toString)
    assert(spans.head.fromExclusive == 9L && spans.head.toInclusive == 20L,
      spans.toSeq.toString)
    // literal-on-the-left comparisons normalize (flip) before pushing
    val flipped = read().where(lit(hi) >= col("ingest_timestamp")
      && lit(lo) <= col("ingest_timestamp"))
    assert(flipped.collect().length == 11)
    assert(filterNodes(flipped).isEmpty, flipped.queryExecution.executedPlan.toString)
    // an unsatisfiable range plans zero partitions and returns nothing
    val none = read().where(col("ingest_timestamp") > lit(hi)
      && col("ingest_timestamp") < lit(lo))
    assert(none.collect().isEmpty)
    // COUNT(*) must NOT answer from the ledger once a predicate is
    // pushed: the ledger count ignores filters
    val countedF = read().where(col("subject") === "k1").agg(count(lit(1)).as("n"))
    val cfPlan = countedF.queryExecution.executedPlan.toString
    assert(!cfPlan.contains("AmqpCountScan"), cfPlan)
    assert(countedF.collect().head.getLong(0) == 25L)
    // LIMIT over pushed predicates is a PARTIAL push: the scan carries
    // the limit (readers stop at 7 survivors) AND Spark keeps its own
    // limit operator for the global cut — never a planning-time window
    // cut, which would count fetched rows instead of survivors
    val limited = read().where(col("subject") === "k1").limit(7)
    val lScan = limited.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.head
    assert(lScan.description().contains("PushedLimit: 7"), lScan.description())
    assert(lScan.description().contains("PushedFilters:"), lScan.description())
    assert(limited.queryExecution.optimizedPlan.toString.contains("GlobalLimit")
      || limited.queryExecution.executedPlan.toString.contains("Limit"),
      s"partial push must keep Spark's limit:\n${limited.queryExecution.optimizedPlan}")
    assert(limited.collect().length == 7)
    // predicates the reader cannot evaluate exactly stay Spark-side
    val residual = read().where(col("body").startsWith("b1"))
    assert(filterNodes(residual).nonEmpty, residual.queryExecution.executedPlan.toString)
    assert(residual.collect().length == 11) // b1, b10..b19
    // IS NULL pushes for the scalar string properties (reply_to is
    // never set here) — exact, no residual Filter
    val nulls = read().where(col("reply_to").isNull)
    assert(filterNodes(nulls).isEmpty, nulls.queryExecution.executedPlan.toString)
    assert(nulls.collect().length == 50)
    assert(read().where(col("reply_to").isNotNull).collect().isEmpty)
    // predicate pushdown COMPOSES with column pruning: a narrow
    // projection under a pushed filter plans a narrow, filtered scan
    val composed = read().where(col("subject") === "k0" &&
        col("ingest_timestamp") >= lit(lo))
      .select(col("message_id"))
    val cScan = composed.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.head
    assert(cScan.description().contains("PushedFilters:"), cScan.description())
    assert(cScan.readSchema().fieldNames.toSeq == Seq("message_id"),
      s"scan must stay pruned under pushed filters: ${cScan.readSchema()}")
    assert(filterNodes(composed).isEmpty, composed.queryExecution.executedPlan.toString)
    assert(composed.collect().map(_.getString(0).toInt).sorted.toSeq == (10 to 50 by 2))
  }

  test("startingTimestamp: a new query begins at the first matching sequence") {
    val (ep, broker) = freshEndpoint("fromts")
    (1 to 20).foreach(i =>
      broker.send("my_address", AmqpMessage(messageId = Some(i.toString),
        body = AmqpValueBody(s"b$i")), timestampMicros = i * 1000000L))
    // batch reads honor the option too (Kafka's startingOffsetsByTimestamp
    // positions batch queries as well): the planned span starts at the
    // first in-bound sequence and runs to the live tail
    val batch = spark.read.format("amqp")
      .option("endpoint", ep).option("address", "my_address")
      .option("startingTimestampMicros", (12 * 1000000L).toString)
      .load()
    assert(batch.select(col("message_id")).collect().map(_.getString(0).toInt).sorted.toSeq
      == ((12 to 20): Range), "batch read must start at the first in-bound sequence")
    // COUNT(*) must NOT answer from the ledger on a timestamp-positioned
    // read: the ledger covers the whole backlog, the query only the
    // at/after-T suffix
    val counted = batch.agg(count(lit(1)).as("n"))
    assert(!counted.queryExecution.executedPlan.toString.contains("AmqpCountScan"),
      counted.queryExecution.executedPlan.toString)
    assert(counted.collect().head.getLong(0) == 9L, "count must cover the suffix only")
    val q = spark.readStream.format("amqp")
      .option("endpoint", ep).option("address", "my_address")
      .option("startingTimestampMicros", (12 * 1000000L).toString)
      .load()
      .select(col("message_id"))
      .writeStream.format("memory").queryName("amqp_fromts").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("amqp_fromts").collect().map(_.getString(0).toInt).sorted.toSeq
      assert(got == (12 to 20), s"must start at seq 12, got $got")
      // messages arriving after the start are delivered regardless of ts
      broker.send("my_address", AmqpMessage(messageId = Some("21"),
        body = AmqpValueBody("late")), timestampMicros = 1L)
      poll {
        assert(spark.table("amqp_fromts").collect().length == 10)
      }
    } finally q.stop()
    // a bound past everything starts at the live tail, not the backlog
    val q2 = spark.readStream.format("amqp")
      .option("endpoint", ep).option("address", "my_address")
      .option("startingTimestamp", "1970-01-01T00:01:40Z") // 100 s = past all
      .load()
      .select(col("message_id"))
      .writeStream.format("memory").queryName("amqp_fromts2").outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.table("amqp_fromts2").collect().isEmpty, "backlog skipped")
      broker.send("my_address", AmqpMessage(messageId = Some("22"),
        body = AmqpValueBody("new")), timestampMicros = 200000000L)
      poll {
        val got = spark.table("amqp_fromts2").collect().map(_.getString(0)).toSeq
        assert(got == Seq("22"))
      }
    } finally q2.stop()
  }

  test("timestampWindow probe: non-monotone timestamps stay exact (covering span + reader re-filter)") {
    val (ep, broker) = freshEndpoint("predwin")
    // out-of-order producer timestamps: seq 1..6 with ts 30,10,40,15,50,20
    Seq(30L, 10L, 40L, 15L, 50L, 20L).zipWithIndex.foreach { case (ts, i) =>
      broker.send("my_address", AmqpMessage(messageId = Some((i + 1).toString),
        body = AmqpValueBody(s"b${i + 1}")), timestampMicros = ts * 1000000L)
    }
    // [10s, 20s] matches seqs 2, 4, 6 → covering span (1, 6] — seqs 3, 5
    // are fetched but must be dropped by the reader's exact re-filter
    assert(broker.timestampWindow("my_address", 10000000L, 20000000L) == Some((1L, 6L)))
    // no match: the EMPTY window anchored at the ledger head (atomic
    // "start here" answer — see AmqpEndpoint.timestampWindow)
    assert(broker.timestampWindow("my_address", 60000000L, 70000000L) == Some((6L, 6L)))
    val got = spark.read.format("amqp")
      .option("endpoint", ep).option("address", "my_address").load()
      .where(col("ingest_timestamp") >= lit(java.time.Instant.ofEpochSecond(10))
        && col("ingest_timestamp") <= lit(java.time.Instant.ofEpochSecond(20)))
      .select(col("message_id")).collect().map(_.getString(0).toInt).sorted.toSeq
    assert(got == Seq(2, 4, 6))
  }

  test("LIMIT pushes to the scan: planned fetch windows sum to n (SupportsPushDownLimit)") {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val (ep, broker) = freshEndpoint("limitpush")
    (1 to 50).foreach(i =>
      broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"b$i"))))
    val limited = spark.read.format("amqp")
      .option("endpoint", ep).option("address", "my_address").load()
      .limit(7)
    assert(limited.collect().length == 7)
    // the scan itself carries the cap: its planned windows span 7 rows,
    // not the 50 replayable ones
    val scan = limited.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.head
    assert(scan.description().contains("PushedLimit: 7"), scan.description())
    val spans = scan.toBatch.planInputPartitions()
      .map(_.asInstanceOf[AmqpInputPartition])
      .map(p => p.toInclusive - p.fromExclusive)
    assert(spans.sum == 7L, s"fetch windows must sum to the limit: ${spans.toSeq}")
    // OFFSET composes: skip the first 10 replayable rows at planning
    // time, then span the limit — the returned bodies prove the cut
    // hit the right sequence range, not just the right count
    val sliced = spark.read.format("amqp")
      .option("endpoint", ep).option("address", "my_address").load()
      .offset(10).limit(4)
    assert(sliced.select(col("body")).collect().map(_.getString(0)).toSeq ==
      (11 to 14).map(i => s"b$i"))
    val s2 = sliced.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.head
    assert(s2.description().contains("PushedOffset: 10"), s2.description())
    val p2 = s2.toBatch.planInputPartitions()
      .map(_.asInstanceOf[AmqpInputPartition]).toSeq
    assert(p2.map(p => p.toInclusive - p.fromExclusive).sum == 4L, p2.toString)
    assert(p2.head.fromExclusive == 10L, p2.toString)
  }

  test("column pruning reaches the AMQP scan (SupportsPushDownRequiredColumns)") {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val (ep, broker) = freshEndpoint("prune")
    broker.send("my_address", AmqpMessage(messageId = Some("p1"),
      subject = Some("s1"),
      applicationProperties = Seq("k" -> "v"),
      body = AmqpValueBody(Seq("expensive", "json", "body"))))
    val df = spark.read.format("amqp")
      .option("endpoint", ep).option("address", "my_address").load()
    def scanSchema(q: org.apache.spark.sql.DataFrame): Seq[String] =
      q.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r.scan.readSchema().fieldNames.toSeq
      }.head
    // a two-column projection reads a two-column scan — not all 11
    val narrow = df.select(col("subject"), col("message_id"))
    assert(scanSchema(narrow).toSet == Set("subject", "message_id"),
      s"scan must read only required columns, got ${scanSchema(narrow)}")
    assert(narrow.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("s1", "p1")))
    // an unprojected read still materializes the full envelope
    assert(scanSchema(df.select(col("*"))).length == AmqpEnvelope.schema.length)
    assert(df.select(col("body")).collect().head.getString(0) ==
      """["expensive","json","body"]""")
  }

  test("deep link batch reads split into bounded sub-partitions (maxRowsPerPartition)") {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val (ep, broker) = freshEndpoint("subpart")
    (1 to 100).foreach(i =>
      broker.send("my_address", AmqpMessage(messageId = Some(i.toString),
        body = AmqpValueBody(s"b$i")), timestampMicros = i * 1000L))
    val df = spark.read.format("amqp")
      .option("endpoint", ep).option("address", "my_address")
      .option("maxRowsPerPartition", "30")
      .load()
    val scan = df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.head
    val parts = scan.toBatch.planInputPartitions().map(_.asInstanceOf[AmqpInputPartition])
    // 100 rows / 30 per partition = 4 sub-partitions: 30+30+30+10,
    // contiguous and disjoint over the link's sequence span
    assert(parts.length == 4, parts.toSeq.toString)
    assert(parts.forall(p => p.toInclusive - p.fromExclusive <= 30L), parts.toSeq.toString)
    assert(parts.map(p => p.toInclusive - p.fromExclusive).sum == 100L)
    val sorted = parts.sortBy(_.fromExclusive)
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a.toInclusive == b.fromExclusive, "contiguous sub-spans")
      case _ => ()
    }
    // no row lost or duplicated across the splits (batch reads carry no
    // ordering contract, so a per-link split is semantics-free)
    assert(df.select(col("message_id")).collect().map(_.getString(0).toInt).sorted.toSeq
      == (1 to 100).toSeq)
    // the MICRO-BATCH planner applies the same bound: an uncapped
    // ReadAllAvailable batch (Trigger.Once admits the whole backlog)
    // must not hand one task a deep link's entire span
    val stream = new AmqpScan(AmqpSourceConfig(ep, "my_address", Seq("my_address"),
        maxPerTrigger = Long.MaxValue, maxPerSecond = 0L, maxRowsPerPartition = 30L))
      .toMicroBatchStream("unused")
    val mb = stream.planInputPartitions(
        AmqpOffset.single("my_address", 0L), AmqpOffset.single("my_address", 100L))
      .map(_.asInstanceOf[AmqpInputPartition])
    assert(mb.length == 4 && mb.map(p => p.toInclusive - p.fromExclusive).sum == 100L,
      mb.toSeq.toString)
  }

  test("filtered limit(n) composes as a partial push: fetch stops at n survivors") {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val (ep, broker) = freshEndpoint("flimit")
    (1 to 800).foreach(i =>
      broker.send("my_address", AmqpMessage(messageId = Some(i.toString),
        subject = Some(if (i % 2 == 0) "hit" else "miss"),
        body = AmqpValueBody(s"b$i")), timestampMicros = i * 1000L))
    val df = spark.read.format("amqp")
      .option("endpoint", ep).option("address", "my_address")
      .option("fetchChunkRows", "50")
      .load()
      .where(col("subject") === "hit").limit(5)
    val scan = df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.head
    assert(scan.description().contains("PushedFilters:"), scan.description())
    assert(scan.description().contains("PushedLimit: 5"), scan.description())
    assert(df.collect().length == 5)
    // the reader stopped FETCHING once 5 rows survived the filter: the
    // delivered watermark sits at the first chunk (50), not the 800-deep
    // span — a filtered peek at a deep queue no longer drains it
    assert(broker.inFlightCount("my_address") >= 700L,
      s"span must not be drained; in-flight = ${broker.inFlightCount("my_address")}")
  }

  test("propertyColumns lifts application properties to pushable top-level columns") {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val (ep, broker) = freshEndpoint("proplift")
    (1 to 40).foreach { i =>
      val props = Seq("region" -> (if (i % 4 == 0) "eu" else "us"), "pri" -> i) ++
        (if (i % 5 == 0) Seq("tier" -> "gold") else Nil)
      broker.send("my_address", AmqpMessage(messageId = Some(i.toString),
        applicationProperties = props,
        body = AmqpValueBody(s"b$i")), timestampMicros = i * 1000L)
    }
    def read() = spark.read.format("amqp")
      .option("endpoint", ep).option("address", "my_address")
      .option("propertyColumns", "region,tier")
      .load()
    // lifted columns append to the envelope schema, nullable strings
    assert(read().schema.fieldNames.takeRight(2).toSeq == Seq("region", "tier"))
    // values stringify exactly like the map column; absent property = NULL
    val rows = read().select(col("message_id"), col("region"), col("tier")).collect()
    assert(rows.forall(r => r.getString(1) == (if (r.getString(0).toInt % 4 == 0) "eu" else "us")))
    assert(rows.count(_.isNullAt(2)) == 32, "tier NULL when the property is absent")
    // equality on a lifted property PUSHES: PushedFilters carries it,
    // Spark plans no re-filter, and the result is exact
    val filtered = read().where(col("region") === "eu")
    val scan = filtered.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.head
    assert(scan.description().contains("region = 'eu'"), scan.description())
    val filterNodes = filtered.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(filterNodes.isEmpty,
      s"lifted-property predicate must not re-filter:\n${filtered.queryExecution.executedPlan}")
    assert(filtered.select(col("message_id")).collect().map(_.getString(0).toInt).sorted.toSeq
      == (4 to 40 by 4).toSeq)
    // IS [NOT] NULL on a lifted property pushes too (absence tests are
    // the other common queue-peek shape)
    val gold = read().where(col("tier").isNotNull)
    assert(gold.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }.isEmpty)
    assert(gold.collect().length == 8)
    // pruning composes: selecting one lifted column scans two columns
    val narrow = read().where(col("region") === "eu").select(col("tier"))
    val nScan = narrow.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.head
    assert(nScan.readSchema().fieldNames.toSet == Set("tier"), nScan.readSchema().toString)
    // a property shadowing an envelope column is refused loudly
    val e = intercept[Exception] {
      spark.read.format("amqp")
        .option("endpoint", ep).option("address", "my_address")
        .option("propertyColumns", "subject").load().collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("shadow"), e.toString)
    // the streaming path lifts identically
    val q = spark.readStream.format("amqp")
      .option("endpoint", ep).option("address", "my_address")
      .option("propertyColumns", "region,tier")
      .load()
      .where(col("region") === "eu")
      .select(col("message_id"))
      .writeStream.format("memory").queryName("amqp_proplift").outputMode("append").start()
    try {
      q.processAllAvailable()
      poll {
        val got = spark.table("amqp_proplift").collect().map(_.getString(0).toInt).sorted.toSeq
        assert(got == (4 to 40 by 4).toSeq)
      }
    } finally q.stop()
  }

  test("typed (long) property lift pushes RANGE predicates; text values are NULL, not coerced") {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val (ep, broker) = freshEndpoint("proplift-typed")
    (1 to 30).foreach { i =>
      // price is numeric for most messages; every 10th carries TEXT in
      // the same property (a sloppy producer), message 30 lacks it
      val props: Seq[(String, Any)] =
        if (i == 30) Nil
        else if (i % 10 == 0) Seq("price" -> s"$i")
        else Seq("price" -> (i * 100L))
      broker.send("my_address", AmqpMessage(messageId = Some(i.toString),
        applicationProperties = props,
        body = AmqpValueBody(s"b$i")), timestampMicros = i * 1000L)
    }
    def read() = spark.read.format("amqp")
      .option("endpoint", ep).option("address", "my_address")
      .option("propertyColumns", "price:long")
      .load()
    // the lifted column is a real BIGINT; text/absent values are NULL
    // (typed projection, never a parse — string "10" must not become 10)
    assert(read().schema("price").dataType ==
      org.apache.spark.sql.types.LongType)
    val rows = read().select(col("message_id"), col("price")).collect()
    assert(rows.count(_.isNullAt(1)) == 3, "2 text (10, 20) + 1 absent (30) = 3 NULLs")
    assert(rows.filter(!_.isNullAt(1))
      .forall(r => r.getLong(1) == r.getString(0).toLong * 100L))
    // a RANGE predicate pushes: both bounds in PushedFilters, no
    // residual Filter, result exact (NULLs excluded by comparison)
    val ranged = read().where(col("price") >= 500L && col("price") < 1500L)
    val scan = ranged.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.head
    assert(scan.description().contains("price >= 500") &&
      scan.description().contains("price <= 1499"), scan.description())
    assert(ranged.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }.isEmpty, s"range must not re-filter:\n${ranged.queryExecution.executedPlan}")
    assert(ranged.select(col("message_id")).collect().map(_.getString(0).toInt).sorted.toSeq
      == (5 to 14).filterNot(_ == 10).toSeq)
    // IS NULL resolves through the TYPE: the text-valued messages count
    // as NULL even though the raw property bag has an entry
    val nulls = read().where(col("price").isNull)
    assert(nulls.collect().map(_.getAs[String]("message_id").toInt).sorted.toSeq
      == Seq(10, 20, 30))
    // sink side round-trips the NUMERIC value: write long-lifted, read
    // long-lifted, range-push against what the sink published
    val (ep2, _) = freshEndpoint("proplift-typed-sink")
    import spark.implicits._
    Seq(("a", 150L), ("b", 250L), ("c", 350L)).toDF("message_id", "price")
      .withColumn("body", col("message_id"))
      .write.format("amqp").option("endpoint", ep2).option("address", "q")
      .option("propertyColumns", "price:long").mode("append").save()
    val back = spark.read.format("amqp")
      .option("endpoint", ep2).option("address", "q")
      .option("propertyColumns", "price:long").load()
      .where(col("price") > 150L && col("price") <= 350L)
      .select(col("message_id")).collect().map(_.getString(0)).sorted.toSeq
    assert(back == Seq("b", "c"), s"typed sink-lift round-trip: $back")
    // unknown lift types refuse loudly
    val e = intercept[Exception] {
      spark.read.format("amqp").option("endpoint", ep)
        .option("address", "my_address")
        .option("propertyColumns", "price:decimal").load()
    }
    assert(e.getMessage.contains("string|long"), e.toString)
  }

  test("startingTimestamp degrades to an exact reader-side filter on a probe-less broker") {
    // A third-party broker without the x-graft timestamp extension
    // (timestampWindow = None): the option's contract — no message
    // before T is ever returned — must hold anyway. The offsets cannot
    // skip the backlog (nothing can prune without a ledger probe), so
    // every reader applies ingest_timestamp >= T exactly.
    class ProbelessBroker extends InMemoryAmqpBroker {
      override def timestampWindow(address: String, loMicros: Long,
          hiMicros: Long): Option[(Long, Long)] = None
    }
    val ep = "mem://probeless"
    AmqpEndpointRegistry.reset(ep)
    val broker = new ProbelessBroker
    AmqpEndpointRegistry.registerBroker(ep, broker)
    (1 to 20).foreach(i =>
      broker.send("my_address", AmqpMessage(messageId = Some(i.toString),
        body = AmqpValueBody(s"b$i")), timestampMicros = i * 1000000L))
    def read() = spark.read.format("amqp")
      .option("endpoint", ep).option("address", "my_address")
      .option("startingTimestampMicros", (12 * 1000000L).toString)
      .load()
    assert(read().select(col("message_id")).collect().map(_.getString(0).toInt).sorted.toSeq
      == (12 to 20).toSeq,
      "degrade path must deliver exactly the at/after-T suffix, not the backlog")
    // the new stream honors T the same way (restart-safe: the filter is
    // derived from config, not from initialOffset)
    val q = spark.readStream.format("amqp")
      .option("endpoint", ep).option("address", "my_address")
      .option("startingTimestampMicros", (12 * 1000000L).toString)
      .load()
      .select(col("message_id"))
      .writeStream.format("memory").queryName("amqp_degrade").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("amqp_degrade").collect().map(_.getString(0).toInt).sorted.toSeq
      assert(got == (12 to 20).toSeq, s"stream degrade must start at T, got $got")
    } finally q.stop()
    // the degrade filter survives a CHECKPOINTED RESTART mid-backlog:
    // a restart constructs a FRESH stream instance and never calls
    // initialOffset — the filter must come from config + a fresh probe.
    // Simulated deterministically: a new stream planning from
    // mid-backlog checkpoint offsets (seq 3, pre-T rows 4..11 still
    // ahead) must hand every reader the ts >= T filter.
    val restarted = new AmqpScan(AmqpSourceConfig(ep, "my_address", Seq("my_address"),
        maxPerTrigger = Long.MaxValue, maxPerSecond = 0L,
        startingTimestampMicros = Some(12 * 1000000L)))
      .toMicroBatchStream("unused")
    val rsParts = restarted.planInputPartitions(
      AmqpOffset.single("my_address", 3L), AmqpOffset.single("my_address", 20L))
    val rsReader = restarted.createReaderFactory().createReader(rsParts.head)
    val rsIds = scala.collection.mutable.ArrayBuffer.empty[Int]
    try {
      while (rsReader.next())
        rsIds += rsReader.get().getUTF8String(0).toString.toInt
    } finally rsReader.close()
    assert(rsIds.sorted.toSeq == (12 to 20).toSeq,
      s"a restarted stream instance must keep filtering the backlog, got $rsIds")

    // a pushed LIMIT or OFFSET cannot compose with the degrade filter:
    // the builder accepted them as EXACT pushes (it cannot see the
    // degrade), so honoring them against survivor counting would
    // return wrong rows — the query must FAIL loudly instead
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(String.valueOf(_)).toSeq
    val err = intercept[Throwable] { read().offset(3).limit(5).collect() }
    assert(chain(err).exists(_.contains("startingTimestamp")), chain(err).mkString("\n"))
    val errL = intercept[Throwable] { read().limit(5).collect() }
    assert(chain(errL).exists(_.contains("startingTimestamp")), chain(errL).mkString("\n"))
  }

  test("browse=true never settles: backlog survives for other consumers") {
    // Distribution-mode "copy" (OASIS AMQP 1.0 §3.5.3): a browsing
    // query tracks its position in its own checkpoint but leaves the
    // broker ledger untouched — the queue-peek/monitoring shape, and
    // the safe pairing for startingTimestamp.
    val (ep, broker) = freshEndpoint("browse")
    (1 to 12).foreach(i =>
      broker.send("my_address", AmqpMessage(messageId = Some(i.toString),
        body = AmqpValueBody(s"m$i"))))
    val ckpt = Files.createTempDirectory("amqp-browse-ckpt").toString
    val out = Files.createTempDirectory("amqp-browse-out").toString
    def drain(): Unit = {
      val q = spark.readStream.format("amqp")
        .option("endpoint", ep).option("address", "my_address")
        .option("browse", "true").load()
        .select(col("message_id"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assert(spark.read.parquet(out).count() == 12)
    // settlement never moved: every message is still replayable
    assert(broker.settledUpTo("my_address") == 0L,
      "a browsing link must not settle")
    // commit() fires while constructing the NEXT batch — nudge one
    // message through a second drain and re-check the floor
    broker.send("my_address", AmqpMessage(messageId = Some("13"),
      body = AmqpValueBody("m13")))
    drain()
    assert(broker.settledUpTo("my_address") == 0L,
      "settlement must stay at the floor across committed batches")
    // the SAME query (checkpoint) saw no duplicates
    assert(spark.read.parquet(out).count() == 13)
    // an INDEPENDENT query (fresh checkpoint) re-reads the full backlog
    val out2 = Files.createTempDirectory("amqp-browse-out2").toString
    val ckpt2 = Files.createTempDirectory("amqp-browse-ckpt2").toString
    val q2 = spark.readStream.format("amqp")
      .option("endpoint", ep).option("address", "my_address")
      .option("browse", "true").load()
      .select(col("message_id"))
      .writeStream.format("parquet")
      .option("path", out2).option("checkpointLocation", ckpt2)
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(out2).collect().map(_.getString(0).toInt).sorted.toSeq
      == (1 to 13).toSeq,
      "a fresh browsing query must see the entire unsettled backlog")
    // control: the default "move" link settles the prefix on commit
    val ckpt3 = Files.createTempDirectory("amqp-move-ckpt").toString
    val out3 = Files.createTempDirectory("amqp-move-out").toString
    def consume(): Unit = {
      val q = stream(ep).select(col("message_id"))
        .writeStream.format("parquet")
        .option("path", out3).option("checkpointLocation", ckpt3)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    consume()
    broker.send("my_address", AmqpMessage(messageId = Some("14"),
      body = AmqpValueBody("m14")))
    consume() // second batch commits the first: settle advances
    assert(broker.settledUpTo("my_address") >= 13L,
      "the consuming control query must settle the delivered prefix")
  }

  test("respectTtl drops expired header-ttl messages exactly; pushdowns adapt") {
    val (ep, broker) = freshEndpoint("ttl")
    val now = 1000000L // the pinned expiry instant (micros)
    // enqueue at t=0: 1ms ttl is long dead at t=1s, 10s ttl is alive,
    // no ttl never expires
    broker.send("my_address", AmqpMessage(messageId = Some("dead"),
      ttlMillis = Some(1L)), 0L)
    broker.send("my_address", AmqpMessage(messageId = Some("alive"),
      ttlMillis = Some(10000L)), 0L)
    broker.send("my_address", AmqpMessage(messageId = Some("nottl")), 0L)
    // boundary: a deadline landing ON the instant is expired (<=)
    broker.send("my_address", AmqpMessage(messageId = Some("edge"),
      ttlMillis = Some(1L)), now - 1000L)
    def read(respect: Boolean) = {
      val b = spark.read.format("amqp")
        .option("endpoint", ep).option("address", "my_address")
      (if (respect) b.option("respectTtl", "true")
        .option("ttlNowMicros", now.toString) else b).load()
    }
    // default mode ignores ttl — all four deliver (a browse must be able
    // to see what a broker still holds)
    assert(read(respect = false).collect().length == 4)
    val df = read(respect = true)
    assert(df.select("message_id").collect().map(_.getString(0)).toSet ==
      Set("alive", "nottl"), "exactly the unexpired classes survive")
    // the expiry filter is visible on the scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ttl respected"), plan)
    // COUNT(*): the ledger-arithmetic pushdown is refused (it would
    // count the dead rows) — the row scan answers with survivors
    val counted = df.agg(count(lit(1)).as("n"))
    val cplan = counted.queryExecution.executedPlan.toString
    assert(!cplan.contains("AmqpCountScan"), s"ledger count leaked:\n$cplan")
    assert(counted.collect().head.getLong(0) == 2L)
    // LIMIT becomes the partial survivors push: one row, never expired
    val one = df.select("message_id").limit(1).collect()
    assert(one.length == 1 && Set("alive", "nottl")(one.head.getString(0)))
    // OFFSET is refused (skip-k-survivors is not planning arithmetic):
    // Spark evaluates it itself, over survivors only
    assert(df.select("message_id").offset(1).collect().length == 1)
  }

  test("streaming TTL: the expiry instant re-snapshots at each micro-batch's planning") {
    val (ep, _) = freshEndpoint("ttlplan")
    def cfgWith(extra: (String, String)*): AmqpSourceConfig = {
      val m = new java.util.HashMap[String, String]()
      m.put("endpoint", ep); m.put("address", "my_address")
      extra.foreach { case (k, v) => m.put(k, v) }
      AmqpSourceConfig(new org.apache.spark.sql.util.CaseInsensitiveStringMap(m))
    }
    val stream = new AmqpMicroBatchStream(cfgWith("respectTtl" -> "true"))
    def plan() = stream.planInputPartitions(
      AmqpOffset(Map("my_address" -> 0L)), AmqpOffset(Map("my_address" -> 10L)))
    val p1 = plan().head.asInstanceOf[AmqpInputPartition]
    assert(p1.ttlNowOverrideMicros.isDefined,
      "a wall-clock TTL stream must carry a per-batch expiry instant")
    Thread.sleep(5) // the clock is ms-granular; let it tick
    val p2 = plan().head.asInstanceOf[AmqpInputPartition]
    assert(p2.ttlNowOverrideMicros.get > p1.ttlNowOverrideMicros.get,
      "each batch plan must re-snapshot the expiry clock — a frozen " +
        "instant lets messages that expire mid-stream live forever")
    // all partitions of ONE batch share the instant (task retries agree)
    val batch = new AmqpMicroBatchStream(
      cfgWith("respectTtl" -> "true", "maxRowsPerPartition" -> "3"))
      .planInputPartitions(
        AmqpOffset(Map("my_address" -> 0L)), AmqpOffset(Map("my_address" -> 10L)))
      .map(_.asInstanceOf[AmqpInputPartition])
    assert(batch.length > 1 &&
      batch.map(_.ttlNowOverrideMicros).distinct.length == 1)
    // a PINNED instant stays pinned: no per-batch override
    val pinned = new AmqpMicroBatchStream(
      cfgWith("respectTtl" -> "true", "ttlNowMicros" -> "123"))
    assert(pinned.planInputPartitions(
        AmqpOffset(Map("my_address" -> 0L)), AmqpOffset(Map("my_address" -> 10L)))
      .head.asInstanceOf[AmqpInputPartition].ttlNowOverrideMicros.isEmpty)
  }

  test("expiredOnly is the exact dual of respectTtl: the two modes partition the backlog") {
    val (ep, broker) = freshEndpoint("ttldual")
    val now = 1000000L
    broker.send("my_address", AmqpMessage(messageId = Some("dead"),
      ttlMillis = Some(1L)), 0L)
    broker.send("my_address", AmqpMessage(messageId = Some("alive"),
      ttlMillis = Some(10000L)), 0L)
    broker.send("my_address", AmqpMessage(messageId = Some("nottl")), 0L)
    broker.send("my_address", AmqpMessage(messageId = Some("edge"),
      ttlMillis = Some(1L)), now - 1000L)
    def read(mode: String) = spark.read.format("amqp")
      .option("endpoint", ep).option("address", "my_address")
      .option(mode, "true").option("ttlNowMicros", now.toString).load()
    val dead = read("expiredOnly")
    assert(dead.select("message_id").collect().map(_.getString(0)).toSet ==
      Set("dead", "edge"), "expiredOnly must deliver exactly the lapsed classes")
    // the sweep's selection is visible on the scan, distinct from respectTtl's
    assert(dead.queryExecution.executedPlan.toString.contains("ttl expired-only"))
    val live = read("respectTtl")
    val union = dead.select("message_id").collect().map(_.getString(0)).toSet ++
      live.select("message_id").collect().map(_.getString(0)).toSet
    assert(union == Set("dead", "edge", "alive", "nottl"),
      "the two modes together must cover the backlog exactly once")
    // expiredOnly refuses the ledger COUNT(*) pushdown like respectTtl
    val cplan = dead.agg(count(lit(1))).queryExecution.executedPlan.toString
    assert(!cplan.contains("AmqpCountScan"), s"ledger count leaked:\n$cplan")
    // the modes are mutually exclusive — asking for both is an error
    val err = intercept[Exception] {
      spark.read.format("amqp").option("endpoint", ep)
        .option("address", "my_address").option("respectTtl", "true")
        .option("expiredOnly", "true").load().collect()
    }
    assert(err.getMessage != null)
  }
}
