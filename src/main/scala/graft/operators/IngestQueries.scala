package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.streaming.{Amqp10Server, AmqpEndpointRegistry, AmqpMessage, AmqpTcpServer, AmqpValueBody, InMemoryAmqpBroker}

/** Puts the AMQP source itself under the DuckDB oracle gate: a
  * deterministic slice of the `events` table is pumped through a broker
  * (driver plays the producer, exactly like the reference's test
  * senders — AMQPTestUtils.scala:99-125 in /root/reference), read back
  * through `spark.read.format("amqp")`, and aggregated. The oracle
  * computes the same aggregate straight from the parquet table, so any
  * loss, duplication, or field corruption in the envelope path (send →
  * credit window → sequence buffer → batch scan → envelope decode →
  * converter columns) breaks the hash match.
  *
  * By default the gate runs over a REAL socket: an in-JVM
  * [[Amqp10Server]] serving AMQP 1.0 framing, with both the pump and
  * the Spark read crossing `amqp10://127.0.0.1:<port>` — so the
  * oracle-gated path exercises the wire codec, framing, credit
  * refusal, and drain-mode fetch, not just in-process buffers. Set
  * `-Dgraft.gate.transport=mem` to pin the in-process broker instead.
  *
  * The pump respects the credit window (1000): refused sends drain the
  * pending slice via fetch — the same consume-to-replenish contract the
  * streaming reader exercises (BASELINE.md credit constants).
  */
object IngestQueries {

  /** Serializes the pump against concurrent invocations in one JVM —
    * the mem path resets the fixed `mem://gate-ingest` endpoint at
    * entry and would clobber an overlapping pump. The harness runs gate
    * queries sequentially; the lock makes the pump phase safe anyway.
    * The returned DataFrame reads lazily: on the mem path a concurrent
    * invocation between return and read still swaps broker state (the
    * sequential-harness assumption); the wire path is immune — each run
    * pumps a fresh per-run address, and a run's messages survive until
    * the run after it settles them away. */
  private val gateLock = new Object
  private val gateRun = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Gate wrapper: [[gateLock]] serialization PLUS streaming state/shuffle
    * partitions sized to the gate slice (optimization guide §2.2/§2.4 —
    * fewer, larger partitions; AQE cannot do this for streams because
    * adaptive execution is disabled in stateful workloads). A gate drains
    * a few hundred to a few thousand rows over a handful of keys, so the
    * session's core-count shuffle default (32 locally) buys no parallelism
    * and costs one state-store instance per partition per stateful
    * operator PER MICRO-BATCH — a stream-stream outer join pays
    * 4 stores x partitions x (data + watermark-eviction) batches in
    * commit/changelog overhead alone. Measured at sf0.1 (32 -> 4):
    * amqp_stream_join2_full 11.6s -> 3.8s, join2_outer 10.3s -> 2.8s,
    * amqp_stream_dedup_ttl 14.3s -> 9.3s, same hashes. Production
    * deployments size state partitions to state volume/throughput, not
    * host cores — override with SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS.
    * Results are partitioning-independent (keyed state); the oracle gate
    * re-proves every query after this change. The conf is restored on
    * exit; the streaming query's session CLONE (captured at start())
    * keeps the gate value for the query's whole life. */
  private def gatedStream[T](s: SparkSession, d: String)(body: => T): T =
    gateLock.synchronized {
      val key = "spark.sql.shuffle.partitions"
      // State-partition count DERIVED from the gate's data volume
      // (VERDICT r9 #5 — the round-1 constant 4 under-parallelizes an
      // unset deployment at real scale): every gate's slice is carved
      // from the events/orders/documents tables, so the source
      // directory's bytes bound the pumped backlog and with it the
      // keyed-state volume. One state partition per 32 MB of source
      // (a few hundred thousand keyed registers), floored at 4 (the
      // round-1 measured local optimum — at gate SF the formula stays
      // below the floor, so local behavior and the driver's bench are
      // unchanged), capped at session parallelism. Env override stays
      // the deployment knob.
      val srcBytes =
        try {
          val dir = new java.io.File(d)
          Option(dir.listFiles()).toSeq.flatten
            .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
        } catch { case _: Throwable => 0L }
      val derived = math.min(s.sparkContext.defaultParallelism.toLong,
        math.max(4L, srcBytes / (32L << 20))).toString
      val parts = sys.env.getOrElse("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", derived)
      val prior = s.conf.getOption(key)
      s.conf.set(key, parts)
      try body
      finally prior match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }

  /** One wire server per JVM backing the gate's default amqp10:// path
    * (port 0 = ephemeral; lives for the JVM, like the registry's
    * cached clients). */
  private lazy val wireGateEndpoint: String = {
    val server = new Amqp10Server(new InMemoryAmqpBroker)
    s"amqp10://127.0.0.1:${server.port}"
  }

  /** TLS flavor of the gate server (`-Dgraft.gate.transport=amqps`):
    * key material generated once per JVM with the JDK's keytool, trust
    * wired through the same system properties executors would use. The
    * gated path then runs pump AND Spark read through the encrypted
    * tunnel. */
  private lazy val wireTlsGateEndpoint: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-gate-tls")
    val ks = s"$dir/server.p12"; val ts = s"$dir/trust.p12"
    val cert = s"$dir/server.cer"; val pw = "gate-tls-pw"
    def keytool(args: String*): Unit = {
      val bin = System.getProperty("java.home") + "/bin/keytool"
      val p = new ProcessBuilder((bin +: args): _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes())
      require(p.waitFor() == 0, s"keytool failed: $out")
    }
    keytool("-genkeypair", "-alias", "gate", "-keyalg", "RSA", "-keysize", "2048",
      "-dname", "CN=127.0.0.1", "-validity", "2", "-storetype", "PKCS12",
      "-keystore", ks, "-storepass", pw, "-keypass", pw)
    keytool("-exportcert", "-alias", "gate", "-keystore", ks,
      "-storepass", pw, "-file", cert)
    keytool("-importcert", "-alias", "gate", "-noprompt", "-storetype", "PKCS12",
      "-keystore", ts, "-storepass", pw, "-file", cert)
    System.setProperty("graft.amqps.truststore", ts)
    System.setProperty("graft.amqps.truststorePassword", pw)
    val server = new Amqp10Server(new InMemoryAmqpBroker,
      tls = Some(graft.streaming.AmqpTls.serverContext(ks, pw)))
    s"amqps://127.0.0.1:${server.port}"
  }

  /** One tcp:// server per JVM for the shared-subscription gate (the
    * claim surface lives on mem://, tcp://, AND the amqp10:// wire —
    * amqp_shared_consumers drives the compact-RPC transport,
    * amqp_shared_wire the interoperable AMQP 1.0 framing). Per-run
    * addresses keep warm runs independent. */
  private lazy val tcpGateEndpoint: String = {
    val server = new AmqpTcpServer(new InMemoryAmqpBroker)
    s"tcp://127.0.0.1:${server.port}"
  }
  private val sharedGateRun = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Resolve (endpoint, address) for one gate run. */
  private def gateTarget(): (String, String) =
    sys.props.getOrElse("graft.gate.transport", "amqp10") match {
      case "mem" =>
        // Fixed endpoint + reset: Bench/Verify invoke this repeatedly in
        // one JVM; a fresh UUID endpoint each time would leak a full copy
        // of the pumped slice into the registry per warm run.
        val ep = "mem://gate-ingest"
        AmqpEndpointRegistry.reset(ep)
        (ep, "gate")
      case _ =>
        // Per-run address keeps runs independent without restarting the
        // server; settling the PREVIOUS run's address frees its messages
        // and prunes the server's delivery ledger, bounding broker
        // message memory to one slice regardless of warm-run count
        // (per-run link/address metadata remains — O(runs), tiny).
        val ep =
          if (sys.props.get("graft.gate.transport").contains("amqps"))
            wireTlsGateEndpoint
          else wireGateEndpoint
        val run = gateRun.incrementAndGet()
        if (run > 1) {
          val client = AmqpEndpointRegistry.endpoint(ep)
          val prev = s"gate-${run - 1}"
          client.settle(prev, client.latestSeq(prev))
        }
        (ep, s"gate-$run")
    }

  /** Drain-aware pump shared by every wire gate: send in ~500-message
    * pipelined batches under the 1000-credit window; a refusal must be
    * a strict SUFFIX (credit contract — resuming at the first refusal
    * re-sends everything after it, so an accepted message there would
    * enqueue twice: fail loudly instead of corrupting the gate), and
    * consuming replenishes credit, so a refusal drains the delivered
    * prefix via fetch and resumes. */
  private def pumpAll(client: graft.streaming.AmqpEndpoint, address: String,
      msgs: Seq[(AmqpMessage, Long)]): Unit = {
    var i = 0
    var fetchedUpTo = 0L
    while (i < msgs.length) {
      val slice = msgs.slice(i, math.min(i + 500, msgs.length))
      val seqs = client.sendMany(address, slice)
      val refusedAt = seqs.indexWhere(_ < 0)
      if (refusedAt < 0) i += slice.length
      else {
        require(seqs.drop(refusedAt).forall(_ < 0),
          s"non-suffix credit refusal at $refusedAt: $seqs")
        i += refusedAt
        val to = client.latestSeq(address)
        client.fetch(address, fetchedUpTo, to)
        fetchedUpTo = to
      }
    }
  }

  /** Run `f` with the RocksDB state-store provider AND CHANGELOG
    * CHECKPOINTING enabled, restoring prior session conf after. Changelog
    * checkpointing is the long-running-pipeline mechanism SURVEY §2.3
    * cites (per-batch uploads ship the delta instead of snapshotting the
    * whole store), so every RocksDB gate runs WITH it — making recovery
    * from changelog replay load-bearing on the hash path wherever a gate
    * restarts mid-stream (amqp_stream_tws_timer, amqp_stream_dedup_ttl). */
  private def withRocksDb[T](s: SparkSession)(f: => T): T = {
    val confs = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true")
    val prior = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try f
    finally prior.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  def amqpIngestRoundtrip(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 10 === 0)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect() // the producer role: driver-side by design, as in the reference's suites
    // Pipelined batches (one disposition round-trip per ~500 messages on
    // socket transports, see AmqpEndpoint.sendMany) sized under the
    // 1000-credit window so at most one drain per batch is ever needed.
    pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          subject = Some(r.getString(1)),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(0))
      })
    s.read.format("amqp")
      .option("endpoint", ep).option("address", address).load()
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

  // -------------------------------------------------- amqp_pattern_multi
  /** PATTERN SUBSCRIPTION under the oracle gate (Kafka
    * `subscribePattern` / ActiveMQ wildcard-destination parity): the
    * events slice is SHARDED BY KEY across three addresses plus a
    * decoy queue carrying the whole slice again, and the read
    * subscribes with `addressPattern` — the three matching queues are
    * DISCOVERED via the transport's address-listing probe (never named
    * in the query), the decoy excluded by the glob. A queue missed by
    * discovery loses a third of the rows; decoy leakage doubles every
    * count — either breaks the hash.
    *
    * Scale shape: discovery is one driver-side probe per plan (like a
    * file listing); each discovered address is its own link partition,
    * so a fleet of queues parallelizes exactly like the static
    * `addresses` list. */
  def amqpPatternMulti(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 13 === 0)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect() // producer role: driver-side by design (reference test senders)
    def msgs(pred: Long => Boolean) =
      rows.toSeq.filter(r => pred(r.getLong(0))).map { r =>
        (AmqpMessage(messageId = Some(r.getLong(0).toString),
          subject = Some(r.getString(1)),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(0))
      }
    (0 until 3).foreach(k =>
      pumpAll(client, s"$address-shard$k", msgs(_ % 3 == k)))
    pumpAll(client, s"$address-decoy", msgs(_ => true))
    s.read.format("amqp")
      .option("endpoint", ep)
      .option("addressPattern", s"$address-shard*").load()
      .select(col("subject").as("event_type"),
        col("body").cast(DoubleType).as("value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
  }

  val amqpPatternMultiSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_id % 13 = 0
      |GROUP BY event_type""".stripMargin

  // -------------------------------------------------- amqp_stream_relay
  /** Queue-to-queue streaming ETL — the source+sink COMPOSITION no
    * other gate exercises: ONE streaming query reads the wire source
    * and writes the exactly-once AMQP sink
    * (`readStream.format("amqp")` → filter/enrich →
    * `writeStream.format("amqp")`), relaying a slice from address A to
    * address B with `click` events dropped and the survivors re-tagged.
    * The slice is pumped in two halves with an AvailableNow drain after
    * each on ONE checkpoint, plus an empty third drain: a relay that
    * re-delivered the first half on restart, or lost the sink's
    * transactional epoch dedup on retry, doubles B's counts; a leak of
    * the dropped class surfaces as an extra group — either breaks the
    * hash. The final read aggregates B back through the source.
    *
    * Scale shape: the relay is the routing/fan-out shape of a message
    * fabric (per-tenant splitting, PII scrubbing between queues) — per
    * trigger it costs the admitted slice through one filter map; the
    * sink's staged transactional publish batches per partition. */
  def amqpStreamRelay(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val dst = s"$address-relay"
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 13 === 7)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect() // producer role: driver-side by design (reference test senders)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-relay-gate").toString
    def pump(rs: Array[org.apache.spark.sql.Row]): Unit =
      pumpAll(client, address, rs.toSeq.map { r =>
        (AmqpMessage(messageId = Some(r.getLong(0).toString),
          subject = Some(r.getString(1)),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(0))
      })
    def drain(): Unit = {
      val q = s.readStream.format("amqp")
        .option("endpoint", ep).option("address", address).load()
        .filter(col("subject") =!= "click")
        .select(col("message_id"),
          concat(lit("relayed-"), col("subject")).as("subject"),
          col("body"))
        .writeStream.format("amqp")
        .option("endpoint", ep).option("address", dst)
        .option("checkpointLocation", s"$ckpt/c")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(120000), "relay gate query hung")
      finally q.stop()
    }
    val (a, b) = rows.splitAt(rows.length / 2)
    pump(a); drain()
    pump(b); drain() // same checkpoint: only the second half relays
    drain()          // nothing new: exactly-once means B gains nothing
    s.read.format("amqp")
      .option("endpoint", ep).option("address", dst).load()
      .select(col("subject").as("event_type"),
        col("body").cast(DoubleType).as("value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
  }

  val amqpStreamRelaySql: String =
    """SELECT 'relayed-' || event_type AS event_type,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_id % 13 = 7 AND event_type <> 'click'
      |GROUP BY event_type""".stripMargin

  // ------------------------------------------------ amqp_stream_pattern
  /** STREAMING pattern subscription under the oracle gate — the dynamic
    * half of `amqp_pattern_multi`: two sharded queues exist when the
    * first AvailableNow drain runs; a THIRD matching queue is created
    * between drains and the second drain — same checkpoint — must
    * DISCOVER it and consume it from its start, while a decoy queue
    * carrying the whole slice again never matches the glob. A missed
    * discovery loses a third of the rows; re-reading the first drain's
    * shards doubles them; decoy leakage doubles everything — all break
    * the hash against DuckDB replaying the slice.
    *
    * Scale shape: one discovery probe per trigger on the driver; each
    * discovered queue is its own link partition. This is the
    * fleet-of-queues catch-up shape (per-tenant/per-sensor addresses)
    * where naming links statically cannot work. */
  def amqpStreamPattern(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 13 === 5)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect() // producer role: driver-side by design (reference test senders)
    val scratch = java.nio.file.Files.createTempDirectory("graft-pattern-gate")
    val outDir = s"$scratch/out"
    val ckpt = s"$scratch/ckpt"
    def msgs(pred: Long => Boolean) =
      rows.toSeq.filter(r => pred(r.getLong(0))).map { r =>
        (AmqpMessage(messageId = Some(r.getLong(0).toString),
          subject = Some(r.getString(1)),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(0))
      }
    def drain(): Unit = {
      val q = s.readStream.format("amqp")
        .option("endpoint", ep).option("addressPattern", s"$address-q*").load()
        .select(col("message_id"), col("subject"), col("body"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(120000), "stream-pattern gate query hung")
      finally q.stop()
    }
    pumpAll(client, s"$address-q0", msgs(_ % 3 == 0))
    pumpAll(client, s"$address-q1", msgs(_ % 3 == 1))
    pumpAll(client, s"$address-decoy", msgs(_ => true))
    drain()
    pumpAll(client, s"$address-q2", msgs(_ % 3 == 2))
    drain() // same checkpoint: must discover q2, not re-read q0/q1
    s.read.parquet(outDir)
      .select(col("subject").as("event_type"),
        col("body").cast(DoubleType).as("value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
  }

  val amqpStreamPatternSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_id % 13 = 5
      |GROUP BY event_type""".stripMargin

  // ---------------------------------------------------- amqp_sql_table
  /** The SQL-DDL face of the source: `CREATE TABLE ... USING amqp` in
    * the session catalog, then a pure-SQL aggregate over it — no
    * DataFrame reader API anywhere on the query path. This is the
    * surface a SQL-only consumer (JDBC/Thrift clients, notebook SQL
    * cells, dbt-style tooling) sees; the reference's stream has no SQL
    * identity at all. DSv2's TableProvider registration is what makes
    * the DDL real: the catalog stores only the options, resolution
    * flows through the same AmqpTable/AmqpScanBuilder the DataFrame
    * path uses, so column pruning and every pushdown ride SQL
    * untouched (the COUNT(*) plan assertion lives in AmqpSourceSpec's
    * SQL-table test).
    *
    * Scale shape: identical to amqp_ingest_roundtrip — the catalog
    * entry is metadata; the scan partitions per link as always. */
  def amqpSqlTable(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 11 === 0)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect() // producer role: driver-side by design (reference test senders)
    pumpAll(client, address, rows.toSeq.map { r =>
      (AmqpMessage(
        messageId = Some(r.getLong(0).toString),
        subject = Some(r.getString(1)),
        body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(0))
    })
    s.sql("DROP TABLE IF EXISTS amqp_sql_gate")
    s.sql(s"CREATE TABLE amqp_sql_gate USING amqp " +
      s"OPTIONS (endpoint '$ep', address '$address')")
    s.sql("""SELECT subject AS event_type, count(*) AS n_events,
        CAST(sum(CAST(CAST(body AS DOUBLE) AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM amqp_sql_gate
      GROUP BY subject""")
  }

  val amqpSqlTableSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_id % 11 = 0
      |GROUP BY event_type""".stripMargin

  // --------------------------------------------------- amqp_ttl_expiry
  /** HEADER-SECTION TTL under the oracle gate: the AMQP 1.0 header's
    * ttl field (§3.2.1, milliseconds from enqueue) rides the wire
    * end-to-end — encoded as the leading header section by the
    * producer, decoded back off the frame by the broker — and a
    * `respectTtl` read DROPS expired messages exactly: three message
    * classes (ttl long lapsed / ttl alive / no ttl) are pumped with
    * producer-controlled enqueue timestamps, the scan is pinned to a
    * fixed expiry instant (`ttlNowMicros`), and only the two surviving
    * classes may reach the aggregate — one leaked expired message or
    * one over-dropped live one breaks the hash.
    *
    * Expiry is enforced in the READER, like a pushed predicate: the
    * broker ledger keeps its dense sequence numbering (settlement and
    * offsets never renumber), which is why this mode refuses the
    * COUNT(*)/OFFSET ledger-arithmetic pushdowns and turns a pushed
    * LIMIT into the partial survivors push (spec-asserted). The expiry
    * instant is snapshotted once per plan on the driver, so every
    * partition and every task retry agrees on what is dead.
    *
    * Scale shape: expiry costs one long comparison per fetched row,
    * before envelope materialization; nothing driver-side grows. */
  /** The pinned expiry instant shared by both TTL gates — the class
    * arithmetic below and the gates' oracle SQL both depend on it. */
  private val TtlGateNowMicros = 500000000000L

  /** Shared producer for the TTL gates: the slice rides the wire with
    * id-classed header ttls — id%3==0 long dead at [[TtlGateNowMicros]]
    * (+1ms from an epoch-micros enqueue), ==1 alive (~11.6 days), ==2
    * no ttl (never expires). Both gates' oracles encode exactly this
    * mapping (`event_id % 3 = 0` ⇔ expired); keep them in lockstep. */
  private def pumpTtlClassed(client: graft.streaming.AmqpEndpoint,
      address: String, slice: DataFrame): Int = {
    val rows = slice
      .select(col("event_id"), col("event_type"), col("value"))
      .collect() // producer role: driver-side by design (reference test senders)
    pumpAll(client, address, rows.toSeq.map { r =>
      val id = r.getLong(0)
      val ttl = (id % 3) match {
        case 0 => Some(1L)
        case 1 => Some(1000000000L)
        case _ => None
      }
      (AmqpMessage(messageId = Some(id.toString), subject = Some(r.getString(1)),
        body = AmqpValueBody(r.getDouble(2).toString), ttlMillis = ttl), id)
    })
    rows.length
  }

  def amqpTtlExpiry(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    pumpTtlClassed(client, address,
      Tables.events(s, d).filter(col("event_id") % 10 === 6))
    s.read.format("amqp")
      .option("endpoint", ep).option("address", address)
      .option("respectTtl", "true")
      .option("ttlNowMicros", TtlGateNowMicros.toString)
      .load()
      .select(col("subject").as("event_type"),
        col("body").cast(DoubleType).as("value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
  }

  val amqpTtlExpirySql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_id % 10 = 6 AND event_id % 3 <> 0
      |GROUP BY event_type""".stripMargin

  // --------------------------------------------------- amqp_dead_letter
  /** Previous run's DLQ address, settled at the next gate entry —
    * gateTarget() only reclaims its own per-run addresses, so the
    * side address this gate invents must reclaim itself (bounds broker
    * memory across Bench's warm re-runs exactly like the main ledger). */
  private var lastDlqAddress: Option[(String, String)] = None

  /** DEAD-LETTERING under the oracle gate — the expiry ROUTING that
    * completes amqp_ttl_expiry's drop semantics (RabbitMQ TTL + DLX /
    * ActiveMQ expiry-address parity): expired messages are not lost,
    * they MOVE to a dead-letter address for inspection and replay.
    *
    * The sweep is client-driven composition, no new broker surface:
    *  1. an `expiredOnly` scan (the dual of `respectTtl` — delivers
    *     exactly the messages whose header ttl lapsed at the pinned
    *     instant) selects the dead,
    *  2. stamped with `x-opt-dlq-reason`/`x-opt-dlq-source` message
    *     annotations, they republish to the DLQ address through the
    *     exactly-once AMQP sink (staged-transaction commit),
    *  3. the gate then reads BOTH queues — the origin under
    *     `respectTtl` (survivors), the DLQ plain — and aggregates
    *     queue-tagged, so one oracle hash proves the partition is
    *     exact: every message lands in exactly one queue, none lost,
    *     none doubled.
    *
    * The origin ledger keeps its dense sequences (settlement is a
    * prefix op; expiry HIDES rows from TTL-respecting consumers rather
    * than renumbering) — the republished copies are new enqueues on
    * the DLQ ledger, carrying no ttl so they never re-expire there.
    *
    * Scale shape: the sweep scan pays one long comparison per fetched
    * row and emits only the dead; the republish is the sink's
    * executor-side transactional publish, sized by the expired volume,
    * never the backlog. */
  def amqpDeadLetter(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val dlq = s"$address-dlq"
    val client = AmqpEndpointRegistry.endpoint(ep)
    lastDlqAddress.foreach { case (pep, pdlq) =>
      // reclaim through the OWNING endpoint — the gate transport can
      // switch between runs (the specs flip amqps/mem), and skipping
      // the settle would leak the old broker's DLQ slice forever
      try {
        val pc = AmqpEndpointRegistry.endpoint(pep)
        pc.settle(pdlq, pc.latestSeq(pdlq))
      } catch { case _: Exception => () } // old endpoint gone: nothing to reclaim
    }
    lastDlqAddress = Some((ep, dlq))
    pumpTtlClassed(client, address,
      Tables.events(s, d).filter(col("event_id") % 10 === 7))
    // the sweep: expired-only scan -> annotate -> exactly-once republish
    s.read.format("amqp")
      .option("endpoint", ep).option("address", address)
      .option("expiredOnly", "true").option("ttlNowMicros", TtlGateNowMicros.toString)
      .load()
      .select(col("message_id"), col("subject"), col("body"),
        map(lit("x-opt-dlq-reason"), lit("expired"),
            lit("x-opt-dlq-source"), lit(address)).as("message_annotations"))
      .write.format("amqp").option("endpoint", ep).option("address", dlq)
      .mode("append").save()
    def agg(df: DataFrame, q: String): DataFrame =
      df.select(col("subject").as("event_type"),
          col("body").cast(DoubleType).as("value"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
        .withColumn("queue", lit(q))
    val live = s.read.format("amqp")
      .option("endpoint", ep).option("address", address)
      .option("respectTtl", "true").option("ttlNowMicros", TtlGateNowMicros.toString)
      .load()
    val dead = s.read.format("amqp")
      .option("endpoint", ep).option("address", dlq).load()
    agg(live, "live").unionByName(agg(dead, "dlq"))
  }

  // ------------------------------------------------- amqp_request_reply
  /** Previous run's reply/overflow addresses, reclaimed at next entry
    * (same discipline as lastDlqAddress — these side addresses are this
    * gate's own inventions, so it settles them itself). */
  private var lastReplyAddresses: Seq[(String, String)] = Nil

  /** REQUEST–REPLY over the envelope's addressing fields — the RPC
    * shape of AMQP messaging (§3.2.4 properties: to / reply-to /
    * correlation-id), driven end to end by PER-ROW SINK ROUTING (the
    * Kafka sink's `topic` column, here `routeByTo=true`):
    *
    *  1. requests pump to the request queue, each carrying a
    *     `reply_to` naming one of TWO reply queues (split by key) and
    *     a unique `correlation_id`;
    *  2. the responder is a BATCH Spark job: read the request queue
    *     through the source, compute the response, and publish through
    *     the exactly-once sink with `to` = the request's `reply_to` —
    *     one write fans out across both reply queues in one staged
    *     transaction;
    *  3. the gate reads each reply queue SEPARATELY and tags rows by
    *     the queue it physically read them from, so a response routed
    *     to the wrong queue (not merely labeled wrong) flips a tag and
    *     breaks the hash; correlation ids are counted distinct per
    *     group, pinning the id round-trip.
    *
    * An overflow fallback address stays registered for null `to` rows;
    * any leak there is a missing reply in the gated aggregate.
    *
    * Scale shape: the responder is one scan → projection → staged
    * transactional publish, all executor-side; routing adds no extra
    * shuffle (the commit walks each staged message to its own queue
    * under sorted per-queue locks). A reply-queue fleet scales like
    * the pattern-subscription fleet: one address = one link. */
  def amqpRequestReply(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    lastReplyAddresses.foreach { case (pep, paddr) =>
      try {
        val pc = AmqpEndpointRegistry.endpoint(pep)
        pc.settle(paddr, pc.latestSeq(paddr))
      } catch { case _: Exception => () }
    }
    val replies = Seq(s"$address-reply0", s"$address-reply1")
    val overflow = s"$address-reply-overflow"
    lastReplyAddresses = (replies :+ overflow).map((ep, _))
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 11 === 3)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect() // producer role: driver-side by design (reference test senders)
    pumpAll(client, address, rows.toSeq.map { r =>
      val id = r.getLong(0)
      (AmqpMessage(
        messageId = Some(id.toString),
        subject = Some(r.getString(1)),
        replyTo = Some(replies((id % 2).toInt)),
        correlationId = Some(s"corr-$id"),
        body = AmqpValueBody(r.getDouble(2).toString)), id)
    })
    // the responder: batch read -> response projection -> routed publish
    s.read.format("amqp")
      .option("endpoint", ep).option("address", address).load()
      .select(
        col("reply_to").as("to"), // route each response to its caller
        col("correlation_id"),
        col("subject"),
        col("body"))
      .write.format("amqp")
      .option("endpoint", ep).option("address", overflow)
      .option("routeByTo", "true")
      .mode("append").save()
    def readReply(a: String, tag: String): DataFrame =
      s.read.format("amqp")
        .option("endpoint", ep).option("address", a).load()
        .select(col("subject").as("event_type"),
          col("body").cast(DoubleType).as("value"), col("correlation_id"))
        .withColumn("reply_queue", lit(tag))
    readReply(replies(0), "reply0").unionByName(readReply(replies(1), "reply1"))
      .groupBy(col("reply_queue"), col("event_type"))
      .agg(count(lit(1)).as("n_replies"),
        countDistinct(col("correlation_id")).as("n_corr"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
  }

  val amqpRequestReplySql: String =
    """SELECT concat('reply', CAST(event_id % 2 AS VARCHAR)) AS reply_queue,
      |  event_type,
      |  CAST(count(*) AS BIGINT) AS n_replies,
      |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_corr,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_id % 11 = 3
      |GROUP BY concat('reply', CAST(event_id % 2 AS VARCHAR)), event_type""".stripMargin

  // --------------------------------------------------- amqp_lag_report
  private var lastLagAddresses: Seq[(String, String)] = Nil

  /** CONSUMER LAG under the oracle gate (Kafka consumer-group lag
    * parity) — the monitoring surface every production queue pipeline
    * dashboards: per address, head (ledger's latest sequence) vs
    * committed (the query's durable checkpoint position) vs lag (the
    * unconsumed backlog).
    *
    * The gate makes all three numbers LOAD-BEARING: slice A is pumped
    * across two shard queues and drained by a checkpointed streaming
    * query, then slice B is pumped as the not-yet-consumed backlog.
    * The report (which reads the CHECKPOINT's commit log — the
    * consumer-group position — plus one head probe per address) must
    * show head = |A|+|B|, committed = |A|, lag = |B| per shard: a
    * drain that under-consumed, a commit log read off the wrong batch,
    * or per-address offsets crossed between shards each move a number
    * and break the hash against the oracle computing the same counts
    * relationally.
    *
    * Scale shape: the report is two tiny checkpoint files + one
    * metadata probe per address, driver-side like a file listing —
    * |addresses| rows regardless of backlog depth; nothing fetched or
    * decoded. */
  def amqpLagReport(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    lastLagAddresses.foreach { case (pep, paddr) =>
      try {
        val pc = AmqpEndpointRegistry.endpoint(pep)
        pc.settle(paddr, pc.latestSeq(paddr))
      } catch { case _: Exception => () }
    }
    val shards = Seq(s"$address-lag0", s"$address-lag1")
    lastLagAddresses = shards.map((ep, _))
    def slice(m: Long) = Tables.events(s, d)
      .filter(col("event_id") % 9 === m)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect() // producer role: driver-side by design (reference test senders)
      .toSeq
    def pumpSharded(rows: Seq[org.apache.spark.sql.Row]): Seq[Long] =
      (0 to 1).map { k =>
        val part = rows.filter(_.getLong(0) % 2 == k)
        pumpAll(client, shards(k), part.map { r =>
          (AmqpMessage(messageId = Some(r.getLong(0).toString),
            subject = Some(r.getString(1)),
            body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(0))
        })
        part.length.toLong
      }
    pumpSharded(slice(2L))
    // the consumer: a checkpointed streaming drain of slice A
    val qname = s"gate_lag_${gateRun.get}"
    val ckpt = java.nio.file.Files.createTempDirectory("gate-lag-ckpt").toString
    val q = s.readStream.format("amqp")
      .option("endpoint", ep)
      .option("addresses", shards.mkString(",")).load()
      .groupBy().count()
      .writeStream.format("memory").queryName(qname)
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(120000), "lag gate drain hung")
    finally q.stop()
    pumpSharded(slice(6L)) // the backlog the report must surface as lag
    graft.streaming.AmqpStreamOps.lagReport(s, ep, ckpt)
      .withColumn("queue",
        when(col("address") === shards(0), lit("shard0")).otherwise(lit("shard1")))
      .select(col("queue"), col("head_seq"), col("committed_seq"), col("lag"))
  }

  val amqpLagReportSql: String =
    """WITH shards(sh) AS (VALUES (0), (1)),
      |a AS (
      |  SELECT event_id % 2 AS sh, CAST(count(*) AS BIGINT) AS c
      |  FROM events WHERE event_id % 9 = 2 GROUP BY event_id % 2),
      |b AS (
      |  SELECT event_id % 2 AS sh, CAST(count(*) AS BIGINT) AS c
      |  FROM events WHERE event_id % 9 = 6 GROUP BY event_id % 2)
      |SELECT concat('shard', CAST(sh AS VARCHAR)) AS queue,
      |  CAST(coalesce(a.c, 0) + coalesce(b.c, 0) AS BIGINT) AS head_seq,
      |  CAST(coalesce(a.c, 0) AS BIGINT) AS committed_seq,
      |  CAST(coalesce(b.c, 0) AS BIGINT) AS lag
      |FROM shards LEFT JOIN a USING (sh) LEFT JOIN b USING (sh)""".stripMargin

  // ---------------------------------------------------- amqp_stream_ttl
  /** TTL enforcement in the MICRO-BATCH path: the same classed slice
    * rides the wire and a `respectTtl` readStream (pinned instant) must
    * deliver only the unexpired classes across a MULTI-BATCH drain —
    * `maxMessagesPerTrigger` forces several micro-batches, so the expiry
    * filter is applied per-batch by the partitions the stream planner
    * emits, not by a one-shot batch scan. Offsets stay seq-dense over
    * the dropped messages (settlement must advance past expired rows —
    * the ledger never renumbers), which this gate exercises implicitly:
    * an offset gap mis-accounted against dropped rows would stall or
    * duplicate the drain and break the hash.
    *
    * The wall-clock variant re-snapshots the expiry instant at each
    * batch's planning (a long stream must not freeze expiry at query
    * start) — spec-pinned in AmqpSourceSpec; the gate pins the instant
    * for cross-engine determinism. */
  def amqpStreamTtl(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val n = pumpTtlClassed(client, address,
      Tables.events(s, d).filter(col("event_id") % 10 === 2))
    val qname = s"gate_stream_ttl_${gateRun.get}"
    // Force a multi-batch drain at EVERY scale factor: the cap tracks
    // the slice (~4 batches) instead of a fixed row count — a fixed 500
    // meant 200 micro-batches at sf0.1 (26 s of trigger overhead for a
    // 2 s query; per-batch cost is scheduling, not data).
    val perTrigger = math.max(500, (n + 3) / 4)
    val q = s.readStream.format("amqp")
      .option("endpoint", ep).option("address", address)
      .option("respectTtl", "true")
      .option("ttlNowMicros", TtlGateNowMicros.toString)
      .option("maxMessagesPerTrigger", perTrigger.toString)
      .load()
      .groupBy(col("subject"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("body").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(120000), "stream-ttl gate query hung")
    finally q.stop()
    s.table(qname).select(col("subject").as("event_type"),
      col("n_events"), col("sum_value"))
  }

  val amqpStreamTtlSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_id % 10 = 2 AND event_id % 3 <> 0
      |GROUP BY event_type""".stripMargin

  val amqpDeadLetterSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  CASE WHEN event_id % 3 = 0 THEN 'dlq' ELSE 'live' END AS queue
      |FROM events WHERE event_id % 10 = 7
      |GROUP BY event_type, CASE WHEN event_id % 3 = 0 THEN 'dlq' ELSE 'live' END""".stripMargin

  // ------------------------------------------------ amqp_stream_parquet
  /** The FILE-SINK leg under the oracle gate: wire stream → Structured
    * Streaming → exactly-once PARQUET sink (`writeStream.format
    * ("parquet")`) → manifest-aware batch read-back → aggregate. This
    * is the path every real archival/training-data pipeline ends in,
    * and the one sink surface no other gate touches: the file sink's
    * `_spark_metadata` commit manifest is what makes the output
    * exactly-once, and the batch read honors it (uncommitted/temp
    * files are invisible).
    *
    * The slice is pumped in TWO halves with a drain (same checkpoint,
    * same output dir) after each, plus a third empty drain: if the
    * second drain re-processed the first half, or the empty drain
    * wrote anything, counts double or drift and the hash breaks — so
    * offset tracking across restarts AND manifest-committed idempotence
    * are both load-bearing for a green gate.
    *
    * Scale shape: the sink writes one file per partition per batch —
    * at 100 TB the knobs are trigger interval and
    * `spark.sql.shuffle.partitions` (file count), plus the compaction
    * pass `corpus_refresh`/`mm_shard_layout` model downstream. */
  def amqpStreamParquet(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 7 === 3) // own address => overlap with %10 slices is fine
      .select(col("event_id"), col("event_type"), col("value"))
      .collect() // producer role: driver-side by design (reference test senders)
    val scratch = java.nio.file.Files.createTempDirectory("graft-parquet-gate")
    val outDir = s"$scratch/out"
    val ckpt = s"$scratch/ckpt"

    def pump(rs: Array[org.apache.spark.sql.Row]): Unit = {
      pumpAll(client, address, rs.toSeq.map { r =>
          (AmqpMessage(
            messageId = Some(r.getLong(0).toString),
            subject = Some(r.getString(1)),
            body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(0))
        })
    }
    def drain(): Unit = {
      val q = s.readStream.format("amqp")
        .option("endpoint", ep).option("address", address).load()
        .select(col("message_id"), col("subject"), col("body"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(120000), "stream-parquet gate query hung")
      finally q.stop()
    }

    val (a, b) = rows.splitAt(rows.length / 2)
    pump(a); drain()
    pump(b); drain() // same checkpoint: must process ONLY the second half
    drain()          // no new data: the manifest must not grow
    s.read.parquet(outDir)
      .select(col("subject").as("event_type"),
        col("body").cast(DoubleType).as("value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
  }

  val amqpStreamParquetSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_id % 7 = 3
      |GROUP BY event_type""".stripMargin

  // ------------------------------------------------- amqp_stream_window
  /** The reference's FLAGSHIP semantics under the oracle gate: a real
    * Structured STREAMING query (readStream → tumbling event-time
    * window → aggregate → memory sink) fed through the AMQP wire, with
    * the window boundaries and per-window aggregates hash-compared to
    * DuckDB computing the same buckets straight from parquet. This is
    * the windowed-aggregation path `AMQPTemperature.scala:84-102`
    * demonstrates (5s tumbling max over temperatures), gated rather
    * than demoed: a disjoint events slice is pumped with each event's
    * REAL timestamp as the AMQP message timestamp, the micro-batch
    * reader replays it, and `window(ingest_timestamp, "1 hour")`
    * buckets must land every message in exactly the right window.
    *
    * Determinism: Trigger.AvailableNow drains the whole backlog and
    * self-terminates; complete-mode windows close when the query does;
    * epoch-aligned tumbling windows make `window.start` (cast to epoch
    * seconds) equal DuckDB's integer hour bucket × 3600; the value sum
    * rides DECIMAL with one terminal double cast. */
  def amqpStreamWindow(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 10 === 1) // disjoint from the ingest gate's slice
      .select(col("event_id"), col("event_type"), col("value"),
        expr("ts_ns div 1000").as("ts_us"))
      .collect() // producer role: driver-side by design (reference test senders)
    pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          subject = Some(r.getString(1)),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(3))
      })
    val qname = s"gate_stream_window_${gateRun.get}"
    val q = s.readStream.format("amqp")
      .option("endpoint", ep).option("address", address).load()
      .groupBy(window(col("ingest_timestamp"), "1 hour").as("w"), col("subject"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("body").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(120000), "stream-window gate query hung")
    finally q.stop()
    s.table(qname)
      .select(col("w.start").cast(LongType).as("wstart_s"),
        col("subject").as("event_type"), col("n_events"), col("sum_value"))
  }

  val amqpStreamWindowSql: String =
    """SELECT (epoch_us(ts) // 3600000000) * 3600 AS wstart_s, event_type,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_id % 10 = 1
      |GROUP BY 1, 2""".stripMargin

  // -------------------------------------------------- amqp_stream_dedup
  /** STATEFUL streaming dedup under the oracle gate: a disjoint events
    * slice is pumped TWICE (every message delivered two times — the
    * at-least-once redelivery a real broker produces on reconnect), and
    * a streaming `dropDuplicates(message_id)` must collapse the stream
    * back to exactly-once before aggregation. The oracle aggregates the
    * slice ONCE from parquet: any under- or over-deduplication breaks
    * the hash. This gates Structured Streaming's keyed dedup state — the
    * semantics the reference's WAL-reliable receiver mode exists for.
    *
    * Determinism: Trigger.AvailableNow + unwatermarked dedup state (all
    * ids retained for the run) + complete-mode aggregate. */
  def amqpStreamDedup(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 10 === 2) // disjoint from the other gates' slices
      .select(col("event_id"), col("event_type"), col("value"))
      .collect()
    var pass = 0
    while (pass < 2) { // duplicate delivery: each message pumped twice
      pumpAll(client, address, rows.toSeq.map { r =>
          (AmqpMessage(
            messageId = Some(r.getLong(0).toString),
            subject = Some(r.getString(1)),
            body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(0))
        })
      pass += 1
    }
    val qname = s"gate_stream_dedup_${gateRun.get}"
    val q = s.readStream.format("amqp")
      .option("endpoint", ep).option("address", address).load()
      .dropDuplicates("message_id")
      .groupBy(col("subject"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("body").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(120000), "stream-dedup gate query hung")
    finally q.stop()
    s.table(qname).select(col("subject").as("event_type"),
      col("n_events"), col("sum_value"))
  }

  val amqpStreamDedupSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_id % 10 = 2
      |GROUP BY event_type""".stripMargin

  // --------------------------------------------------- amqp_stream_join
  /** Stream-STATIC broadcast join under the oracle gate: streamed
    * messages are enriched against a dimension table read from parquet
    * (nation, broadcast — the canonical streaming-enrichment shape) and
    * aggregated per dimension attribute. The join key rides in the
    * message's APPLICATION PROPERTIES, so this also gates the
    * properties map end-to-end through the broker/wire path — send-side
    * encoding, envelope map materialization, and keyed extraction in a
    * streaming plan. Any corruption of the property value, the map, or
    * the join path moves rows between nations and breaks the hash.
    *
    * Scale shape: the static side is broadcast once per run (Spark
    * re-broadcasts per micro-batch only if the plan changes); state is
    * the complete-mode aggregate only — the join itself is stateless.
    * This is the pattern the reference's users hand-roll with foreachRDD
    * + driver-side lookups; here it is one declarative join. */
  def amqpStreamJoin(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 10 === 3) // disjoint from the other gates' slices
      .select(col("event_id"), col("event_type"), col("value"), col("user_id"))
      .collect()
    pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          subject = Some(r.getString(1)),
          applicationProperties = Seq("user_id" -> r.getLong(3).toString),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(0))
      })
    val dim = broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name")))
    val qname = s"gate_stream_join_${gateRun.get}"
    val q = s.readStream.format("amqp")
      .option("endpoint", ep).option("address", address).load()
      .select(col("body"),
        (col("application_properties")("user_id").cast(LongType) % 25).as("nkey"))
      .join(dim, col("nkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("body").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(120000), "stream-join gate query hung")
    finally q.stop()
    s.table(qname).select(col("n_name"), col("n_events"), col("sum_value"))
  }

  val amqpStreamJoinSql: String =
    """SELECT n_name, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events JOIN nation ON n_nationkey = user_id % 25
      |WHERE event_id % 10 = 3
      |GROUP BY n_name""".stripMargin

  // ------------------------------------------------ amqp_stream_session
  /** SESSION windows over the stream, under the gate: per-user sessions
    * with a 30-minute inactivity gap, built by Structured Streaming's
    * `session_window` state merging — the dynamic-window semantics the
    * fixed `window()` gate cannot cover (session extents depend on the
    * DATA, so state must merge adjacent windows as messages arrive; with
    * multi-link sources messages interleave across partitions and the
    * merge order is exercised for real). The oracle rebuilds the same
    * sessions relationally (lag + running island sum). Boundary rule:
    * Spark merges iff the next event lands STRICTLY inside start+gap,
    * so the oracle's island break is `diff < gap`, not `<=` — an
    * off-by-one here moves boundary events between sessions and breaks
    * the hash.
    *
    * Scale shape: session state is per-user and bounded by the gap;
    * the complete-mode output is session-count-sized. */
  def amqpStreamSession(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 10 === 4) // disjoint from the other gates' slices
      .select(col("event_id"), col("user_id"), col("value"),
        expr("ts_ns div 1000").as("ts_us"))
      .collect()
    pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          subject = Some(r.getLong(1).toString),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(3))
      })
    val qname = s"gate_stream_session_${gateRun.get}"
    val q = s.readStream.format("amqp")
      .option("endpoint", ep).option("address", address).load()
      .groupBy(session_window(col("ingest_timestamp"), "30 minutes").as("sw"),
        col("subject"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("body").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(120000), "stream-session gate query hung")
    finally q.stop()
    s.table(qname)
      .select(col("subject").as("user_key"),
        col("sw.start").cast(LongType).as("start_s"),
        col("n_events"), col("sum_value"))
  }

  val amqpStreamSessionSql: String =
    """WITH f AS (
      |  SELECT CAST(user_id AS VARCHAR) AS user_key, value,
      |    epoch_us(ts) AS ts_us, event_id
      |  FROM events WHERE event_id % 10 = 4),
      |flags AS (
      |  SELECT user_key, value, ts_us, event_id,
      |    CASE WHEN ts_us - lag(ts_us) OVER
      |           (PARTITION BY user_key ORDER BY ts_us, event_id) < 1800000000
      |         THEN 0 ELSE 1 END AS new_sess
      |  FROM f),
      |sessed AS (
      |  SELECT user_key, value, ts_us,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_key ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
      |  FROM flags)
      |SELECT user_key, CAST(min(ts_us) // 1000000 AS BIGINT) AS start_s,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM sessed GROUP BY user_key, sess_id""".stripMargin

  // --------------------------------------------------- amqp_stream_late
  /** LATE-DATA semantics under the oracle gate: watermarked append-mode
    * windows across TWO streaming runs sharing one checkpoint, with
    * out-of-order past-watermark messages pumped over the wire in the
    * second run. Phase 1 drains slice A plus an hour-aligning anchor, so
    * the persisted watermark lands EXACTLY on an hour boundary HA; phase
    * 2 restarts from the checkpoint and pumps (a) slice B with two
    * thirds of its rows shifted +2h (fresh) and one third −48h
    * (hopelessly late — every one must be dropped), (b) a probe whose
    * window END equals HA exactly — Spark drops a late row iff its
    * window end <= watermark (verified against MemoryStream), so this
    * message sits ON the boundary and a drop-rule off-by-one moves it
    * between windows/oblivion and breaks the hash — and (c) a second
    * anchor aligning the FINAL watermark to HB, plus a probe whose
    * window end equals HB exactly (the emit boundary: windows are
    * finalized iff end <= watermark). The oracle reproduces the whole
    * construction arithmetically from parquet: same anchors, same
    * boundary probes, the drop filter `window_end > HA` applied ONLY to
    * phase-2 rows, and the final emit filter `window_end <= HB`.
    *
    * Determinism: each phase is one data micro-batch (AvailableNow,
    * no rate limit) + the no-data flush batch; watermarks derive from
    * anchor timestamps by exact integer arithmetic (anchors are ms- and
    * hour-aligned, so the engine's ms truncation is a no-op); append
    * rows are collected via foreachBatch across both runs. Restart
    * recovery (offset replay + watermark restoration from the commit
    * log) is part of the gated path. */
  def amqpStreamLate(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    import s.implicits._
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-late-gate").toString
    val HourUs = 3600000000L

    def pump(msgs: Seq[(AmqpMessage, Long)]): Unit = pumpAll(client, address, msgs)
    def msg(id: String, subject: String, body: String, tsUs: Long): (AmqpMessage, Long) =
      (AmqpMessage(messageId = Some(id), subject = Some(subject),
        body = AmqpValueBody(body)), tsUs)

    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Double)]
    def drain(): Unit = {
      val q = s.readStream.format("amqp")
        .option("endpoint", ep).option("address", address).load()
        .withWatermark("ingest_timestamp", "2 hours")
        .groupBy(window(col("ingest_timestamp"), "1 hour").as("w"), col("subject"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("body").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
        .select(col("w.start").cast(LongType).as("wstart_s"), col("subject"),
          col("n_events"), col("sum_value"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val got = b.collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
          buf.synchronized { buf ++= got }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(120000), "stream-late gate query hung")
      finally q.stop()
    }

    // ---- phase 1: slice A at its real event times + hour-aligning anchor
    val a = Tables.events(s, d)
      .filter(col("event_id") % 10 === 5)
      .select(col("event_id"), col("event_type"), col("value"),
        expr("ts_ns div 1000").as("ts_us"))
      .collect()
    val maxA = a.map(_.getLong(3)).max
    val ha = ((maxA + HourUs - 1) / HourUs) * HourUs + HourUs // hour-aligned, > every A row
    pump(a.toSeq.map(r => msg(r.getLong(0).toString, r.getString(1),
        r.getDouble(2).toString, r.getLong(3)))
      :+ msg("anchor-a", "anchor_a", "0.5", ha + 2 * HourUs)) // watermark → exactly HA
    drain()

    // ---- phase 2: late + fresh slice B, boundary probes, final anchor
    val b = Tables.events(s, d)
      .filter(col("event_id") % 10 === 6)
      .select(col("event_id"), col("event_type"), col("value"),
        expr("ts_ns div 1000").as("ts_us"))
      .collect()
    val bShift = b.toSeq.map { r =>
      val ts = if (r.getLong(0) % 3 == 0) r.getLong(3) - 48 * HourUs // hopelessly late
               else r.getLong(3) + 2 * HourUs                       // fresh
      msg(r.getLong(0).toString, r.getString(1), r.getDouble(2).toString, ts)
    }
    val probes = Seq(
      msg("probe-late-eq", "probe_late_eq", "1.0", ha - HourUs / 2), // window end == HA: dropped
      msg("probe-kept", "probe_kept", "1.0", ha + HourUs / 2))       // end HA+1h > HA: kept
    val maxP2 = math.max(maxA, (bShift ++ probes).map(_._2).max)
    val hb = ((maxP2 + HourUs - 1) / HourUs) * HourUs + HourUs
    pump(bShift ++ probes ++ Seq(
      msg("anchor-b", "anchor_b", "0.5", hb + 2 * HourUs),           // final watermark → HB
      msg("probe-emit-eq", "probe_emit_eq", "1.0", hb - HourUs / 2)))// end == HB: emitted
    drain()

    buf.toSeq.toDF("wstart_s", "event_type", "n_events", "sum_value")
  }

  val amqpStreamLateSql: String =
    """WITH a AS (
      |  SELECT event_type, value, epoch_us(ts) AS ts_us
      |  FROM events WHERE event_id % 10 = 5),
      |ha AS (SELECT ((max(ts_us) + 3599999999) // 3600000000) * 3600000000
      |              + 3600000000 AS h FROM a),
      |bsh AS (
      |  SELECT event_type, value,
      |    CASE WHEN event_id % 3 = 0 THEN epoch_us(ts) - 172800000000
      |         ELSE epoch_us(ts) + 7200000000 END AS ts_us
      |  FROM events WHERE event_id % 10 = 6),
      |p2 AS (
      |  SELECT * FROM bsh
      |  UNION ALL SELECT 'probe_late_eq', 1.0, h - 1800000000 FROM ha
      |  UNION ALL SELECT 'probe_kept', 1.0, h + 1800000000 FROM ha),
      |hb AS (SELECT ((greatest((SELECT max(ts_us) FROM a), (SELECT max(ts_us) FROM p2))
      |               + 3599999999) // 3600000000) * 3600000000 + 3600000000 AS h),
      |kept AS (
      |  SELECT event_type, value, ts_us FROM a
      |  UNION ALL SELECT 'anchor_a', 0.5, h + 7200000000 FROM ha
      |  UNION ALL
      |  SELECT p2.event_type, p2.value, p2.ts_us FROM p2, ha
      |  WHERE (p2.ts_us // 3600000000 + 1) * 3600000000 > ha.h
      |  UNION ALL SELECT 'anchor_b', 0.5, h + 7200000000 FROM hb
      |  UNION ALL SELECT 'probe_emit_eq', 1.0, h - 1800000000 FROM hb)
      |SELECT (ts_us // 3600000000) * 3600 AS wstart_s, event_type,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM kept, hb
      |WHERE (ts_us // 3600000000 + 1) * 3600000000 <= hb.h
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------- amqp_stream_dedup_wm
  /** TIME-BOUNDED streaming dedup under the oracle gate:
    * `dropDuplicatesWithinWatermark` — the form a 100 TB stream
    * actually runs, because the plain `dropDuplicates` gate
    * (amqp_stream_dedup) keeps every key it has ever seen and its state
    * grows without bound. Phase 1 pumps every message TWICE (adjacent)
    * plus a watermark anchor; phase 2 restarts from the checkpoint and
    * re-pumps HALF the ids a third time at fresh timestamps — by then
    * the watermark has passed each phase-1 row's event time + delay, so
    * their dedup state MUST have been evicted and the third copies MUST
    * re-emit. The oracle counts each id once plus once more for the
    * re-pumped half: over-retention (plain-dedup semantics, third copy
    * suppressed) and under-retention (intra-batch duplicate leaking
    * through) both break the hash from opposite directions.
    *
    * Determinism: each phase is one data micro-batch + the no-data
    * flush batch that executes eviction; the phase-2 timestamps are a
    * closed form of the phase-1 maximum (`wm + 1h + (id mod 3600) s`),
    * so no pumped row is ever late and the oracle reproduces the
    * construction arithmetically from parquet.
    *
    * Scale shape: state is one (key, expiry) register per id bounded
    * by the watermark horizon — the whole point of the operator. */
  def amqpStreamDedupWm(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    import s.implicits._
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dedupwm-gate").toString
    val HourUs = 3600000000L

    def pump(msgs: Seq[(AmqpMessage, Long)]): Unit = pumpAll(client, address, msgs)
    def msg(id: String, subject: String, body: String, tsUs: Long): (AmqpMessage, Long) =
      (AmqpMessage(messageId = Some(id), subject = Some(subject),
        body = AmqpValueBody(body)), tsUs)

    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def drain(): Unit = {
      val q = s.readStream.format("amqp")
        .option("endpoint", ep).option("address", address).load()
        .withWatermark("ingest_timestamp", "2 hours")
        .dropDuplicatesWithinWatermark("message_id")
        .select(col("subject"),
          col("body").cast(DecimalType(18, 2)).cast(DoubleType).as("v"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val got = b.collect().map(r => (r.getString(0), r.getDouble(1)))
          buf.synchronized { buf ++= got }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(120000), "stream-dedup-wm gate query hung")
      finally q.stop()
    }

    val rows = Tables.events(s, d)
      .filter(col("event_id") % 7 === 3)
      .select(col("event_id"), col("event_type"), col("value"),
        expr("ts_ns div 1000").as("ts_us"))
      .collect()
    val maxTs = rows.map(_.getLong(3)).max
    // final phase-1 watermark: hour-ceiling + 3h — strictly past every
    // row's (event time + 2h delay), so ALL phase-1 dedup state evicts
    val wm = ((maxTs + HourUs - 1) / HourUs) * HourUs + 3 * HourUs
    val once = rows.toSeq.map(r => msg(r.getLong(0).toString, r.getString(1),
      r.getDouble(2).toString, r.getLong(3)))
    pump(once.flatMap(m => Seq(m, m)) // duplicate delivery: adjacent copies
      :+ msg("anchor-a", "anchor_a", "0.5", wm + 2 * HourUs))
    drain()

    // phase 2: a third copy of HALF the ids at fresh (never-late) times
    val third = rows.toSeq.filter(_.getLong(0) % 2 == 0).map { r =>
      msg(r.getLong(0).toString, r.getString(1), r.getDouble(2).toString,
        wm + HourUs + (r.getLong(0) % 3600L) * 1000000L)
    }
    pump(third)
    drain()

    buf.toSeq.toDF("event_type", "v")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("v").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
  }

  val amqpStreamDedupWmSql: String =
    """WITH a AS (
      |  SELECT event_id, event_type, value
      |  FROM events WHERE event_id % 7 = 3),
      |kept AS (
      |  SELECT event_type, value FROM a
      |  UNION ALL
      |  SELECT event_type, value FROM a WHERE event_id % 2 = 0
      |  UNION ALL SELECT 'anchor_a', 0.5)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM kept GROUP BY event_type""".stripMargin

  // -------------------------------------------------- amqp_stream_state
  /** CUSTOM keyed state under the oracle gate: `mapGroupsWithState` —
    * the arbitrary-state API the built-in gates (window / session /
    * dedup aggregations) never touch — maintains a per-event-type
    * running (count, cent-sum, max-timestamp) register over the wire
    * stream and emits the updated register each micro-batch (update
    * mode). The gate keeps each key's LAST emission, which must equal
    * DuckDB's batch aggregate of the slice: state initialization,
    * iterator consumption, update() round-trips through the state
    * store, and emission order are all on the hash path.
    *
    * Determinism: cents via BigDecimal(body).setScale(2, HALF_UP)·100
    * — the exact integer the oracle's DECIMAL(18,2)·100 cast produces
    * (the double's shortest string round-trips, same convention every
    * other gate uses); count/max are order-free.
    *
    * Scale shape: state is one 24-byte register per key; each batch
    * shuffles only (key, row) pairs to the state partitions. */
  def amqpStreamState(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    import s.implicits._
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-state-gate").toString
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 10 === 7) // disjoint from the other gates' slices
      .select(col("event_id"), col("event_type"), col("value"),
        expr("ts_ns div 1000").as("ts_us"))
      .collect()
    pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          subject = Some(r.getString(1)),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(3))
      })
    val emitted =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long, Long)]
    val q = s.readStream.format("amqp")
      .option("endpoint", ep).option("address", address).load()
      .select(col("subject"), col("body"),
        unix_micros(col("ingest_timestamp")).as("ts_us"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(
          org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, String, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Long, Long)]) =>
          var (n, cents, mx) = state.getOption.getOrElse((0L, 0L, 0L))
          it.foreach { case (_, body, ts) =>
            n += 1
            cents += (BigDecimal(body)
              .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
            if (ts > mx) mx = ts
          }
          state.update((n, cents, mx))
          (key, n, cents, mx)
      }
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[(String, Long, Long, Long)],
                       id: Long) =>
        val got = b.collect().map(r => (id, r._1, r._2, r._3, r._4))
        emitted.synchronized { emitted ++= got }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(120000), "stream-state gate query hung")
    finally q.stop()
    // last emission per key = the final state register
    emitted.groupBy(_._2).values.map(_.maxBy(_._1))
      .map { case (_, k, n, c, mx) => (k, n, c, mx) }
      .toSeq.toDF("event_type", "n_events", "sum_cents", "max_ts_us")
  }

  val amqpStreamStateSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |    AS sum_cents,
      |  CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us
      |FROM events WHERE event_id % 10 = 7
      |GROUP BY event_type""".stripMargin

  // -------------------------------------------------- amqp_sink_roundtrip
  /** The SINK side under the oracle gate: where every other gate's
    * producer is a driver-side client pump (the reference's test-sender
    * role), this one publishes DISTRIBUTED — `df.write.format("amqp")`
    * maps envelope columns to messages on the executors and commits via
    * the sink's staged transactional publish, over the wire endpoint.
    * The batch is then read back through the source and aggregated, so
    * the gate hash covers the full sink encode path: column→envelope
    * mapping, executor-side publish, transaction declare/discharge,
    * and the value's string round-trip through an AMQP body.
    *
    * Scale shape: the write is one map-shaped pass (no shuffle; each
    * task publishes its partition and the commit is one coordinator
    * round); the read-back aggregate is the ingest gate's shape. */
  def amqpSinkRoundtrip(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    Tables.events(s, d)
      .filter(col("event_id") % 10 === 8) // disjoint from the other gates' slices
      .select(col("event_id").cast(StringType).as("message_id"),
        col("event_type").as("subject"),
        col("value").cast(StringType).as("body"))
      .write.format("amqp").option("endpoint", ep).option("address", address)
      .mode("append").save()
    s.read.format("amqp")
      .option("endpoint", ep).option("address", address).load()
      .select(col("subject").as("event_type"),
        col("body").cast(DoubleType).as("value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
  }

  val amqpSinkRoundtripSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_id % 10 = 8
      |GROUP BY event_type""".stripMargin

  // ------------------------------------------------ amqp_stream_join2
  /** STREAM-STREAM join under the oracle gate — the last streaming API
    * surface the gates didn't cover (amqp_stream_join is
    * stream-STATIC). One events slice is split by parity across TWO
    * links of the same wire endpoint (split on (event_id div 10) % 2 —
    * the slice's own ids are all ≡9 mod 10, so raw parity would empty
    * one side); two readStreams join on user key with a 24-hour
    * event-time band (right side in [left, left+24h]),
    * exercising dual-source micro-batch planning and the symmetric
    * state join buffering BOTH sides. Matched pairs are collected in
    * append mode and aggregated per user; the oracle computes the same
    * band self-join relationally. Inner stream-stream joins need no
    * watermark, so the drain is complete and exact regardless of how
    * the two backlogs interleave across batches.
    *
    * Scale shape: join state is keyed by user and bounded by the band
    * in any watermarked deployment; the gate's complete drain is the
    * deterministic test form. */
  def amqpStreamJoin2(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    import s.implicits._
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val (aL, aR) = (s"$address-L", s"$address-R")
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 10 === 9) // the last unused slice
      .select(col("event_id"), col("user_id"), col("value"),
        expr("ts_ns div 1000").as("ts_us"))
      .collect()
    for ((addr, parity) <- Seq((aL, 0L), (aR, 1L))) {
      val side = rows.filter(r => (r.getLong(0) / 10) % 2 == parity)
      pumpAll(client, addr, side.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          subject = Some(r.getLong(1).toString),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(3))
      })
    }
    def side(addr: String, p: String): DataFrame =
      s.readStream.format("amqp")
        .option("endpoint", ep).option("address", addr).load()
        .select(col("subject").as(s"${p}_u"),
          col("body").cast(DecimalType(18, 2)).as(s"${p}_v"),
          col("ingest_timestamp").as(s"${p}_ts"))
    val joined = side(aL, "l").join(side(aR, "r"),
      col("l_u") === col("r_u") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 24 HOURS"))
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-join2-gate").toString
    val q = joined
      .select(col("l_u"), ((col("l_v") + col("r_v")) * 100).cast(LongType).as("cents"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val got = b.collect().map(r => (r.getString(0), r.getLong(1)))
        pairs.synchronized { pairs ++= got }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(120000), "stream-stream join gate hung")
    finally q.stop()
    pairs.toSeq.toDF("user_key", "cents")
      .groupBy(col("user_key"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("cents")).as("sum_pair_cents"))
  }

  val amqpStreamJoin2Sql: String =
    """WITH e AS (
      |  SELECT event_id, CAST(user_id AS VARCHAR) AS u,
      |    CAST(value AS DECIMAL(18,2)) AS v, epoch_us(ts) AS ts_us
      |  FROM events WHERE event_id % 10 = 9),
      |l AS (SELECT * FROM e WHERE (event_id // 10) % 2 = 0),
      |r AS (SELECT * FROM e WHERE (event_id // 10) % 2 = 1)
      |SELECT l.u AS user_key, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(CAST((l.v + r.v) * 100 AS BIGINT)) AS BIGINT) AS sum_pair_cents
      |FROM l JOIN r ON l.u = r.u
      |  AND r.ts_us >= l.ts_us AND r.ts_us <= l.ts_us + 86400000000
      |GROUP BY l.u""".stripMargin

  // ------------------------------------------------ amqp_stream_corpus
  /** The TRAINING-DATA FUNNEL inside Structured Streaming, under the
    * gate: a documents slice is pumped TWICE over the wire (at-least-
    * once redelivery), and the stream deduplicates on CONTENT — a
    * double char-fold of the body and its reverse (two independent
    * mod-2³¹−1 folds ≈ a 62-bit key, so a single-fold collision cannot
    * silently merge distinct texts) — then scores each surviving text
    * with the corpus quality expression and aggregates a quality-decile
    * histogram with token volume. This runs the text-pipeline Column
    * expressions (tokenize, quality) INSIDE a streaming plan with
    * stateful dedup ahead of a streaming aggregate — the shape of a
    * real streaming ingestion+curation pipeline, where the other gates
    * each cover one piece.
    *
    * Determinism: dedup keys on content, and every aggregated value is
    * a function of the text alone, so WHICH duplicate survives cannot
    * matter; quality is the same IEEE expression both engines evaluate
    * (txt_quality's gate proves it), so floor(q·10) buckets agree.
    *
    * Scale shape: dedup state is one (h, h2) pair per distinct text;
    * the histogram is a ≤11-row complete-mode aggregate. */
  def amqpStreamCorpus(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    graft.expressions.CharFoldHash.register(s)
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.documents(s, d)
      .filter(col("doc_id") % 5 === 3)
      .select(col("doc_id"), col("text"))
      .collect()
    var pass = 0
    while (pass < 2) { // duplicate delivery: every document pumped twice
      pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(s"${r.getLong(0)}-p$pass"),
          body = AmqpValueBody(r.getString(1))), r.getLong(0))
      })
      pass += 1
    }
    val qname = s"gate_stream_corpus_${gateRun.get}"
    val q = s.readStream.format("amqp")
      .option("endpoint", ep).option("address", address).load()
      .select(col("body"),
        expr("char_fold_hash(body)").as("h"),
        expr("char_fold_hash(reverse(body))").as("h2"))
      .dropDuplicates("h", "h2")
      .select(
        floor(graft.functions.TextFunctions.qualityScore(col("body")) * 10)
          .cast(LongType).as("qbucket"),
        graft.functions.TextFunctions.tokenCount(col("body")).as("n_tokens"))
      .groupBy(col("qbucket"))
      .agg(count(lit(1)).as("n_texts"), sum(col("n_tokens")).as("sum_tokens"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(120000), "stream-corpus gate query hung")
    finally q.stop()
    s.table(qname).select(col("qbucket"), col("n_texts"), col("sum_tokens"))
  }

  lazy val amqpStreamCorpusSql: String = {
    val dt = "list_filter(string_split_regex(trim(text), ' +'), t -> t <> '')"
    val h1 = graft.functions.HashFunctions.charFoldHashSql("text")
    val h2 = graft.functions.HashFunctions.charFoldHashSql("reverse(text)")
    s"""WITH d AS (
       |  SELECT text, $h1 AS h, $h2 AS hh
       |  FROM documents WHERE doc_id % 5 = 3),
       |u AS (SELECT any_value(text) AS text FROM d GROUP BY h, hh),
       |q AS (
       |  SELECT CAST(floor((
       |    least(CAST(len($dt) AS DOUBLE) / 64.0, 1.0) * 0.4
       |    + least((CASE WHEN len($dt) = 0 THEN 0.0
       |        ELSE CAST(len(list_filter($dt, t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
       |             / CAST(len($dt) AS DOUBLE) END) * 4.0, 1.0) * 0.3
       |    + (CASE WHEN (CASE WHEN len($dt) = 0 THEN 0.0
       |        ELSE CAST(list_sum(list_transform($dt, t -> CAST(length(t) AS BIGINT))) AS DOUBLE)
       |             / CAST(len($dt) AS DOUBLE) END) BETWEEN 3.0 AND 8.0
       |       THEN 1.0 ELSE 0.5 END) * 0.3) * 10) AS BIGINT) AS qbucket,
       |    CAST(len($dt) AS BIGINT) AS n_tokens
       |  FROM u)
       |SELECT qbucket, CAST(count(*) AS BIGINT) AS n_texts,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
       |FROM q GROUP BY qbucket""".stripMargin
  }

  // ------------------------------------------------ amqp_count_pushdown
  /** Aggregate pushdown under the oracle gate: a bare COUNT(*) over
    * the AMQP batch read answers from the broker's sequence ledger
    * (high-water minus settled floor) via [[graft.streaming
    * .AmqpCountScan]] — the "scan" moves 8 bytes of metadata, no
    * message body crosses the wire. The gate pumps a slice over the
    * default amqp10:// transport and hash-matches the pushed count
    * against DuckDB counting the same slice; AmqpSourceSpec separately
    * pins the PLAN (AmqpCountScan present, no HashAggregate, grouped
    * aggregates refuse the pushdown).
    *
    * Scale shape: this is what turns a monitoring `df.count()` on a
    * 100 TB queue snapshot from a full drain into an O(1) metadata
    * probe — the same ledger AmqpBatchRead plans its fetch bounds
    * from, so the pushed answer is exactly the row scan's. */
  def amqpCountPushdown(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 10 === 4)
      .select(col("event_id"))
      .collect() // producer role: driver-side by design (reference test senders)
    pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(messageId = Some(r.getLong(0).toString),
          body = AmqpValueBody(r.getLong(0).toString)), r.getLong(0))
      })
    s.read.format("amqp")
      .option("endpoint", ep).option("address", address).load()
      .agg(count(lit(1)).as("n_msgs"))
  }

  val amqpCountPushdownSql: String =
    """SELECT count(*) AS n_msgs FROM events WHERE event_id % 10 = 4""".stripMargin

  // ---------------------------------------------- amqp_stream_from_ts
  /** Timestamp-anchored stream start under the oracle gate — the
    * Kafka `startingOffsetsByTimestamp` parity surface: a NEW consumer
    * attaching to a queue with `option("startingTimestamp", T)` must
    * begin at the first sequence whose enqueue timestamp reaches T
    * (resolved through the endpoint's timestampWindow probe — over the
    * wire on the default transport) instead of draining the backlog.
    * The slice is pumped in enqueue-timestamp order (the monotone
    * contract under which a timestamp start is exact, like Kafka's
    * per-partition offsetsForTimes); the oracle aggregates only the
    * events at/after the anchor — a stream that starts one sequence
    * early or late breaks the count and the hash.
    *
    * Scale shape: the probe is one planning-time ledger lookup; the
    * skipped history is never fetched, never decoded, never crosses
    * the wire — attaching at "yesterday 00:00" on a 100 TB queue costs
    * the tail, not the backlog. */
  def amqpStreamFromTs(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 7 === 2)
      .select(col("event_id"), col("event_type"), col("value"),
        expr("ts_ns div 1000").as("ts_us"))
      .orderBy(col("ts_us"), col("event_id")) // monotone enqueue order
      .collect() // producer role: driver-side by design (reference test senders)
    pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          subject = Some(r.getString(1)),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(3))
      })
    val qname = s"gate_from_ts_${gateRun.get}"
    val q = s.readStream.format("amqp")
      .option("endpoint", ep).option("address", address)
      .option("startingTimestamp", "2024-01-15T00:00:00Z")
      .load()
      .groupBy(col("subject").as("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("body").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(120000), "stream-from-ts gate query hung")
    finally q.stop()
    s.table(qname).select(col("event_type"), col("n_events"), col("sum_value"))
  }

  val amqpStreamFromTsSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE event_id % 7 = 2 AND ts >= TIMESTAMP '2024-01-15'
      |GROUP BY event_type""".stripMargin

  // -------------------------------------------- amqp_stream_join2_outer
  /** Watermarked stream-stream LEFT OUTER join under the oracle gate —
    * the sibling of [[amqpStreamJoin2]] that exercises the
    * watermark-driven NULL-EMISSION path the inner form never touches:
    * an unmatched left row may only be emitted (with nulls) once the
    * global watermark proves no in-band right row can still arrive, so
    * both sides carry `withWatermark` (1 h) and the join's 24-hour
    * event-time band bounds the state.
    *
    * Determinism: after the real slice, an ANCHOR message is pumped on
    * EACH link 60 days past the slice's max timestamp (the global
    * watermark is the MIN across sources, so both sides must advance).
    * That drives the final watermark beyond every real left row's band
    * end, forcing all 600+ unmatched-left nulls out of state before
    * Trigger.AvailableNow terminates (the post-data no-data batch
    * performs the eviction). The anchors use non-numeric user keys so
    * they match nothing; the left anchor — whose own band the watermark
    * never passes — is filtered from the collected output, and the
    * right anchor is invisible to a left-outer join by construction.
    * The oracle computes the same banded LEFT JOIN relationally: any
    * missing, duplicated, or premature null row breaks the hash.
    *
    * Scale shape: identical to the inner gate — state keyed by user,
    * bounded by watermark + band; null emission adds no extra state. */
  def amqpStreamJoin2Outer(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    import s.implicits._
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val (aL, aR) = (s"$address-L", s"$address-R")
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 7 === 5) // own per-run address: slice overlap is fine
      .select(col("event_id"), col("user_id"), col("value"),
        expr("ts_ns div 1000").as("ts_us"))
      .collect()
    val anchorTs = rows.map(_.getLong(3)).max + 60L * 24 * 3600 * 1000000L
    for ((addr, parity, anchorKey) <- Seq((aL, 0L, "anchor-l"), (aR, 1L, "anchor-r"))) {
      val side = rows.filter(r => (r.getLong(0) / 10) % 2 == parity)
      pumpAll(client, addr, side.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          subject = Some(r.getLong(1).toString),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(3))
      } :+ (AmqpMessage(messageId = Some(anchorKey), subject = Some(anchorKey),
        body = AmqpValueBody("0.0")), anchorTs))
    }
    def side(addr: String, p: String): DataFrame =
      s.readStream.format("amqp")
        .option("endpoint", ep).option("address", addr).load()
        .select(col("subject").as(s"${p}_u"),
          col("body").cast(DecimalType(18, 2)).as(s"${p}_v"),
          col("ingest_timestamp").as(s"${p}_ts"))
        .withWatermark(s"${p}_ts", "1 hour")
    val joined = side(aL, "l").join(side(aR, "r"),
      col("l_u") === col("r_u") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 24 HOURS"),
      "left_outer")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Option[Long])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-join2o-gate").toString
    val q = joined
      .select(col("l_u"), ((col("l_v") + col("r_v")) * 100).cast(LongType).as("cents"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val got = b.collect().map(r =>
          (r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        out.synchronized { out ++= got }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(120000), "outer stream-stream join gate hung")
    finally q.stop()
    out.toSeq.filterNot(_._1 == "anchor-l").toDF("user_key", "cents")
      .groupBy(col("user_key"))
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("cents"))).as("n_unmatched"),
        sum(col("cents")).as("sum_pair_cents"))
  }

  val amqpStreamJoin2OuterSql: String =
    """WITH e AS (
      |  SELECT event_id, CAST(user_id AS VARCHAR) AS u,
      |    CAST(value AS DECIMAL(18,2)) AS v, ts
      |  FROM events WHERE event_id % 7 = 5),
      |l AS (SELECT * FROM e WHERE (event_id // 10) % 2 = 0),
      |r AS (SELECT * FROM e WHERE (event_id // 10) % 2 = 1)
      |SELECT l.u AS user_key,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(*) - count(r.u) AS BIGINT) AS n_unmatched,
      |  CAST(sum(CAST((l.v + r.v) * 100 AS BIGINT)) AS BIGINT) AS sum_pair_cents
      |FROM l LEFT JOIN r ON l.u = r.u
      |  AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 24 HOURS
      |GROUP BY l.u""".stripMargin

  // --------------------------------------------- amqp_stream_join2_full
  /** Watermarked stream-stream FULL OUTER join under the oracle gate —
    * completes the join family (inner → left-outer → FULL): unmatched
    * rows must now flush from BOTH sides' state, each under its own
    * eviction rule derived from the band. A left row evicts (emitting
    * right-nulls) once the watermark passes `l_ts + 24h`; a right row
    * evicts (emitting left-nulls) once the watermark passes `r_ts` —
    * because any future left row's `l_ts` is at least the watermark,
    * so no band `[l_ts, l_ts+24h]` can still reach back to it. Both
    * directions are driven by the same dual far-future anchors as the
    * left-outer gate (global watermark = min over sources); both
    * anchors are filtered from the collected output (each would
    * otherwise surface as its side's unmatched row, or pin state).
    *
    * The oracle is the relational banded FULL JOIN grouped by
    * `coalesce(l.u, r.u)` — a missing, duplicated, or premature null
    * emission on EITHER side breaks the per-key row count, the side-
    * specific null tallies, or the matched-pair cents sum.
    *
    * Scale shape: same as the inner/left gates — state keyed by user,
    * bounded by watermark + band on both sides; full-outer adds no
    * state beyond left-outer, only the extra right-side emission. */
  def amqpStreamJoin2Full(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    import s.implicits._
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val (aL, aR) = (s"$address-L", s"$address-R")
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 7 === 6) // own per-run address: slice overlap is fine
      .select(col("event_id"), col("user_id"), col("value"),
        expr("ts_ns div 1000").as("ts_us"))
      .collect()
    val anchorTs = rows.map(_.getLong(3)).max + 60L * 24 * 3600 * 1000000L
    for ((addr, parity, anchorKey) <- Seq((aL, 0L, "anchor-l"), (aR, 1L, "anchor-r"))) {
      val side = rows.filter(r => (r.getLong(0) / 10) % 2 == parity)
      pumpAll(client, addr, side.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          subject = Some(r.getLong(1).toString),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(3))
      } :+ (AmqpMessage(messageId = Some(anchorKey), subject = Some(anchorKey),
        body = AmqpValueBody("0.0")), anchorTs))
    }
    def side(addr: String, p: String): DataFrame =
      s.readStream.format("amqp")
        .option("endpoint", ep).option("address", addr).load()
        .select(col("subject").as(s"${p}_u"),
          col("body").cast(DecimalType(18, 2)).as(s"${p}_v"),
          col("ingest_timestamp").as(s"${p}_ts"))
        .withWatermark(s"${p}_ts", "1 hour")
    val joined = side(aL, "l").join(side(aR, "r"),
      col("l_u") === col("r_u") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 24 HOURS"),
      "full_outer")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Option[String], Option[String], Option[Long])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-join2f-gate").toString
    val q = joined
      .select(col("l_u"), col("r_u"),
        ((col("l_v") + col("r_v")) * 100).cast(LongType).as("cents"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val got = b.collect().map(r => (
          if (r.isNullAt(0)) None else Some(r.getString(0)),
          if (r.isNullAt(1)) None else Some(r.getString(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        out.synchronized { out ++= got }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(120000), "full-outer stream-stream join gate hung")
    finally q.stop()
    out.toSeq
      .filterNot(t => t._1.exists(_.startsWith("anchor")) || t._2.exists(_.startsWith("anchor")))
      .toDF("l_u", "r_u", "cents")
      .groupBy(coalesce(col("l_u"), col("r_u")).as("user_key"))
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("l_u"))).as("n_left_null"),
        (count(lit(1)) - count(col("r_u"))).as("n_right_null"),
        sum(col("cents")).as("sum_pair_cents"))
  }

  val amqpStreamJoin2FullSql: String =
    """WITH e AS (
      |  SELECT event_id, CAST(user_id AS VARCHAR) AS u,
      |    CAST(value AS DECIMAL(18,2)) AS v, ts
      |  FROM events WHERE event_id % 7 = 6),
      |l AS (SELECT * FROM e WHERE (event_id // 10) % 2 = 0),
      |r AS (SELECT * FROM e WHERE (event_id // 10) % 2 = 1)
      |SELECT coalesce(l.u, r.u) AS user_key,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(*) - count(l.u) AS BIGINT) AS n_left_null,
      |  CAST(count(*) - count(r.u) AS BIGINT) AS n_right_null,
      |  CAST(sum(CAST((l.v + r.v) * 100 AS BIGINT)) AS BIGINT) AS sum_pair_cents
      |FROM l FULL JOIN r ON l.u = r.u
      |  AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 24 HOURS
      |GROUP BY coalesce(l.u, r.u)""".stripMargin

  // ----------------------------------------------- amqp_filter_pushdown
  /** Predicate pushdown under the oracle gate: a timestamp-range +
    * subject-equality peek at a queue snapshot. The scan builder
    * accepts both conjuncts ([[graft.streaming.AmqpScanBuilder]]
    * SupportsPushDownV2Filters), the batch planner prunes each
    * address's fetch window to the tightest sequence span covering the
    * timestamp bounds (endpoint timestampWindow probe — over the wire
    * on the default amqp10:// transport), and the partition reader
    * evaluates the predicates exactly, so Spark plans NO re-filter:
    * if the pushdown dropped or leaked a single message the count,
    * sum, or id-extrema below hash-mismatch the oracle computing the
    * same slice straight from parquet. AmqpSourceSpec separately pins
    * the plan (PushedFilters marker, no post-scan Filter, pruned
    * windows).
    *
    * Scale shape: a time-bounded monitoring query on a 100 TB queue
    * ("what landed between 08:00 and 09:00?") fetches the covering
    * span instead of draining the backlog — and messages outside the
    * span never even pay envelope decode on the executors. */
  def amqpFilterPushdown(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 7 === 1) // own per-run address: %10 slice overlap is fine
      .select(col("event_id"), col("event_type"), col("value"),
        expr("ts_ns div 1000").as("ts_us"))
      .collect() // producer role: driver-side by design (reference test senders)
    pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          subject = Some(r.getString(1)),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(3))
      })
    s.read.format("amqp")
      .option("endpoint", ep).option("address", address).load()
      // Instant literals: exact epoch-micros bounds, independent of the
      // session/JVM timezone (the parquet ts is epoch-micros too)
      .where(col("ingest_timestamp") >= lit(java.time.Instant.parse("2024-01-08T00:00:00Z"))
        && col("ingest_timestamp") < lit(java.time.Instant.parse("2024-01-16T00:00:00Z"))
        && col("subject") === "click")
      .agg(count(lit(1)).as("n_msgs"),
        sum(col("body").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"),
        min(col("message_id").cast(LongType)).as("min_id"),
        max(col("message_id").cast(LongType)).as("max_id"))
  }

  val amqpFilterPushdownSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_msgs,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  min(event_id) AS min_id, max(event_id) AS max_id
      |FROM events
      |WHERE event_id % 7 = 1 AND event_type = 'click'
      |  AND ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-16'""".stripMargin

  // -------------------------------------------- amqp_property_pushdown
  /** Lifted-application-property pushdown under the oracle gate — BOTH
    * directions of the `propertyColumns` option: the producer is the
    * DISTRIBUTED SINK writing plain string columns (`kind`, `region`)
    * that the sink's property lift turns into application properties
    * on the staged messages; the read lifts them back as top-level
    * string columns — prunable AND pushable, which the map column
    * itself can never be (V2 predicates reference columns, not map
    * lookups) — pushes `kind = 'click'` into the scan (the partition
    * reader evaluates it against the property bag before any envelope
    * materialization), and groups by the lifted region. Any drift in
    * the sink lift, lift-back order, NULL handling, or property
    * stringification breaks the hash. AmqpSourceSpec separately pins
    * the plan (PushedFilters on the lifted name, no residual Filter,
    * pruning); AmqpSinkSpec pins the sink-side merge rules.
    *
    * Scale shape: THE common queue-peek predicate — "my property =
    * value" — now skips body decode for every non-matching message
    * and composes with the partial-limit fetch stop; on the map
    * column it would fetch, decode, and stringify everything. */
  def amqpPropertyPushdown(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    Tables.events(s, d)
      .filter(col("event_id") % 7 === 4)
      .select(col("event_id").cast(StringType).as("message_id"),
        col("event_type").as("kind"),
        concat(lit("r"), (col("user_id") % 3).cast(StringType)).as("region"),
        col("value").cast(StringType).as("body"))
      .write.format("amqp").option("endpoint", ep).option("address", address)
      .option("propertyColumns", "kind,region")
      .mode("append").save()
    s.read.format("amqp")
      .option("endpoint", ep).option("address", address)
      .option("propertyColumns", "kind,region")
      .load()
      .where(col("kind") === "click")
      .groupBy(col("region"))
      .agg(count(lit(1)).as("n_msgs"),
        sum(col("body").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"),
        min(col("message_id").cast(LongType)).as("min_id"),
        max(col("message_id").cast(LongType)).as("max_id"))
  }

  val amqpPropertyPushdownSql: String =
    """SELECT 'r' || CAST(user_id % 3 AS VARCHAR) AS region,
      |  CAST(count(*) AS BIGINT) AS n_msgs,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  min(event_id) AS min_id, max(event_id) AS max_id
      |FROM events WHERE event_id % 7 = 4 AND event_type = 'click'
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------- amqp_typed_property
  /** TYPED property lift under the oracle gate — `propertyColumns =
    * kind,price_cents:long` both directions: the sink lifts a LONG
    * column into a NUMERIC application property (not text), the read
    * lifts it back as a BIGINT column, and a RANGE predicate on it —
    * the push a string lift structurally cannot take (string compare
    * would order "9" > "10") — rides the scan down to the partition
    * reader along with the string equality. The reader evaluates both
    * exactly against the typed property bag before any envelope
    * materialization; the oracle replays the range relationally, so a
    * lift that stringified the number, coerced text, or fumbled a
    * bound's inclusivity breaks the hash. AmqpSourceSpec pins the plan
    * (both predicates in PushedFilters, no residual Filter) and the
    * NULL contract (a text-valued property is NULL in a long lift).
    *
    * Scale shape: the numeric queue-peek predicate ("price between X
    * and Y") now prunes at the reader for the cost of two long
    * compares per message — on the map column it would fetch, decode,
    * and stringify everything. */
  def amqpTypedProperty(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    Tables.events(s, d)
      .filter(col("event_id") % 9 === 7)
      .select(col("event_id").cast(StringType).as("message_id"),
        col("event_type").as("kind"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("price_cents"),
        col("user_id").cast(StringType).as("body"))
      .write.format("amqp").option("endpoint", ep).option("address", address)
      .option("propertyColumns", "kind,price_cents:long")
      .mode("append").save()
    s.read.format("amqp")
      .option("endpoint", ep).option("address", address)
      .option("propertyColumns", "kind,price_cents:long")
      .load()
      .where(col("price_cents") >= 5000L && col("price_cents") < 20000L &&
        col("kind") === "purchase")
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_msgs"),
        sum(col("price_cents")).as("sum_cents"),
        min(col("message_id").cast(LongType)).as("min_id"),
        max(col("message_id").cast(LongType)).as("max_id"))
  }

  val amqpTypedPropertySql: String =
    """SELECT event_type AS kind, CAST(count(*) AS BIGINT) AS n_msgs,
      |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |    AS sum_cents,
      |  min(event_id) AS min_id, max(event_id) AS max_id
      |FROM events
      |WHERE event_id % 9 = 7 AND event_type = 'purchase'
      |  AND CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) >= 5000
      |  AND CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) < 20000
      |GROUP BY event_type""".stripMargin

  // ---------------------------------------------------- amqp_stream_tws
  /** `transformWithState` under the oracle gate — Spark 4's successor
    * arbitrary-state API (typed state variables in the RocksDB store,
    * the only provider it supports), which until this gate was only
    * spec-proven equal to its old-API sibling. The per-event-type
    * running-max changelog ([[graft.streaming.AmqpStreamOps
    * .runningMaxChangelogTws]]) runs over the wire stream; the gate
    * keeps each key's LAST emission — the final running max — which
    * must equal DuckDB's batch MAX of the slice. StatefulProcessor
    * init, ValueState round-trips through RocksDB, and the
    * advance-only emission contract are all on the hash path.
    *
    * Determinism: cents via the same DECIMAL(18,2)·100 convention as
    * every other gate; MAX is order-free, and the changelog's final
    * emission per key is the overall max regardless of batching.
    *
    * Scale shape: one int register per live key in RocksDB with
    * changelog checkpointing — the state API a forever-running 100 TB
    * pipeline should target. */
  def amqpStreamTws(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    import s.implicits._
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 7 === 6)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect()
    pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          subject = Some(r.getString(1)),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(0))
      })
    withRocksDb(s) {
      val ckpt = java.nio.file.Files.createTempDirectory("graft-tws-gate").toString
      val env = s.readStream.format("amqp")
        .option("endpoint", ep).option("address", address).load()
        .withColumn("cents",
          (col("body").cast(DecimalType(18, 2)) * 100).cast(IntegerType))
      val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int)]
      val q = graft.streaming.AmqpStreamOps.runningMaxChangelogTws(env, "subject", "cents")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[graft.streaming.AmqpStreamOps.MaxUpdate],
           id: Long) =>
            val got = b.collect().map(u => (id, u.key, u.max_value))
            emitted.synchronized { emitted ++= got }
            ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(120000), "transformWithState gate query hung")
      finally q.stop()
      // last emission per key = the final running max
      emitted.groupBy(_._2).values.map(_.maxBy(_._1))
        .map { case (_, k, mx) => (k, mx) }
        .toSeq.toDF("event_type", "max_cents")
    }
  }

  val amqpStreamTwsSql: String =
    """SELECT event_type,
      |  CAST(max(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS INTEGER)
      |    AS max_cents
      |FROM events WHERE event_id % 7 = 6
      |GROUP BY event_type""".stripMargin

  // ---------------------------------------- amqp_stream_leaderboard
  /** `transformWithState` LIST state under the oracle gate: the
    * streaming top-3 leaderboard ([[graft.streaming.AmqpStreamOps
    * .topKLeaderboardTws]]) maintains each event type's three largest
    * order values in a bounded RocksDB ListState as the slice drains
    * over the wire in several micro-batches (`maxMessagesPerTrigger`
    * forces merges of state across batch boundaries — a board built
    * from one batch would pass trivially). Each key's LAST emission is
    * exploded to (event_type, rank, cents) and must equal DuckDB's
    * batch top-3 multiset; a lost board entry, a mis-merge at a batch
    * boundary, or an emission ordering bug each breaks the hash.
    *
    * Scale shape: k ints per live key in the state store regardless of
    * stream length; emissions are change-driven (a saturated board
    * goes quiet), so output volume tracks board churn, not traffic. */
  def amqpStreamLeaderboard(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    import s.implicits._
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 11 === 7)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect()
    pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          subject = Some(r.getString(1)),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(0))
      })
    withRocksDb(s) {
      val ckpt = java.nio.file.Files.createTempDirectory("graft-board-gate").toString
      val perTrigger = math.max(100, (rows.length + 3) / 4) // several batches
      val env = s.readStream.format("amqp")
        .option("endpoint", ep).option("address", address)
        .option("maxMessagesPerTrigger", perTrigger.toString).load()
        .withColumn("cents",
          (col("body").cast(DecimalType(18, 2)) * 100).cast(IntegerType))
      val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Seq[Int])]
      val q = graft.streaming.AmqpStreamOps.topKLeaderboardTws(env, "subject", "cents", 3)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[graft.streaming.AmqpStreamOps.LeaderboardUpdate],
           id: Long) =>
            val got = b.collect().map(u => (id, u.key, u.top))
            emitted.synchronized { emitted ++= got }
            ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(120000), "leaderboard gate query hung")
      finally q.stop()
      emitted.groupBy(_._2).values.map(_.maxBy(_._1))
        .flatMap { case (_, k, top) =>
          top.zipWithIndex.map { case (c, i) => (k, (i + 1).toLong, c) }
        }
        .toSeq.toDF("event_type", "rank", "cents")
    }
  }

  val amqpStreamLeaderboardSql: String =
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS INTEGER) AS cents
      |  FROM events WHERE event_id % 11 = 7),
      |l AS (
      |  SELECT event_type, list(cents ORDER BY cents DESC) AS ls
      |  FROM c GROUP BY event_type)
      |SELECT event_type, CAST(r AS BIGINT) AS rank, ls[r] AS cents
      |FROM l, (SELECT unnest(generate_series(1, 3)) AS r) t
      |WHERE r <= len(ls)""".stripMargin

  // ------------------------------------------- amqp_stream_distinct
  /** `transformWithState` MAP state under the oracle gate: the
    * streaming exact distinct-count ([[graft.streaming.AmqpStreamOps
    * .distinctCountTws]]) maintains per-event-type sub-key registers
    * (user ids) in RocksDB MapState while the slice drains over the
    * wire in several micro-batches. Each key's LAST emission — the
    * final live distinct count — must equal DuckDB's batch
    * COUNT(DISTINCT user_id); a membership probe that misses across a
    * batch boundary double-counts, a lost register under-counts, and
    * either breaks the hash. With ValueState (running max), ListState
    * (leaderboard), MapState (this gate) and event-time timers
    * (session flush) all oracle-gated, every typed state variable of
    * the successor API carries a hard signal.
    *
    * Scale shape: one map entry per live (key, user) pair — exact
    * distinct's register cost; the 100 TB form swaps in a mergeable
    * sketch and keeps this exact operator as its audit. */
  def amqpStreamDistinct(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    import s.implicits._
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 13 === 9)
      .select(col("event_id"), col("event_type"), col("user_id"))
      .collect()
    pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          subject = Some(r.getString(1)),
          body = AmqpValueBody(r.getLong(2).toString)), r.getLong(0))
      })
    withRocksDb(s) {
      val ckpt = java.nio.file.Files.createTempDirectory("graft-distinct-gate").toString
      val perTrigger = math.max(100, (rows.length + 3) / 4) // several batches
      val env = s.readStream.format("amqp")
        .option("endpoint", ep).option("address", address)
        .option("maxMessagesPerTrigger", perTrigger.toString).load()
      val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
      val q = graft.streaming.AmqpStreamOps.distinctCountTws(env, "subject", "body")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[graft.streaming.AmqpStreamOps.DistinctUpdate],
           id: Long) =>
            val got = b.collect().map(u => (id, u.key, u.distinct_count))
            emitted.synchronized { emitted ++= got }
            ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(120000), "distinct gate query hung")
      finally q.stop()
      emitted.groupBy(_._2).values.map(_.maxBy(_._1))
        .map { case (_, k, n) => (k, n) }
        .toSeq.toDF("event_type", "distinct_users")
    }
  }

  val amqpStreamDistinctSql: String =
    """SELECT event_type,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
      |FROM events WHERE event_id % 13 = 9
      |GROUP BY event_type""".stripMargin

  // ---------------------------------------------- amqp_stream_tws_timer
  /** EVENT-TIME TIMERS under the oracle gate — the second
    * `transformWithState` capability (the first, typed ValueState, is
    * gated by `amqp_stream_tws`): [[graft.streaming.AmqpStreamOps
    * .sessionFlushTws]] runs per-event-type idle-session detection over
    * the wire, flushing a session exactly when the watermark passes its
    * (last event time + 30 min) deadline. The operator splits event-time
    * islands IN-LINE within a batch (see its doc), so its output is a
    * pure function of (events, gap) — which is precisely what lets
    * DuckDB replay it as relational gaps-and-islands (lag + running
    * island sum), like `amqp_stream_session` does for the built-in
    * `session_window`. What's on the hash path here and nowhere else:
    * StatefulProcessor timer registration/extension, stale-timer
    * suppression, `handleExpiredTimer` firing from the watermark, and
    * timer+state recovery across a checkpointed RESTART (phase 2 is a
    * second AvailableNow run on the same checkpoint whose far anchor
    * fires every surviving timer).
    *
    * Determinism: event times are truncated to WHOLE SECONDS before
    * pumping (and the oracle islands on the same `epoch_us(ts) //
    * 1000000` seconds — truncation is not monotone-equivalent across
    * granularities, so both engines must cut islands on the identical
    * integers); messages are pumped in ascending truncated-ts order so
    * the 0-delay watermark never drops a row; break rule is STRICTLY
    * MORE than the gap between consecutive truncated seconds, matching
    * the processor's `ts_ms > armed deadline`. Anchor sessions (keys
    * `zz_anchor*`) drive the watermark and are filtered from output.
    *
    * Scale shape: one (count, sum, timer) register per OPEN session key
    * in RocksDB; completed islands never hold state across batches. */
  def amqpStreamTwsTimer(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    import s.implicits._
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 11 === 5)
      .select(col("event_id"), col("event_type"), col("value"),
        expr("(ts_ns div 1000000000) * 1000000").as("ts_us"))
      .orderBy(col("ts_us"), col("event_id"))
      .collect()
    require(rows.nonEmpty, "tws-timer gate slice is empty")
    val maxTsUs = rows.last.getLong(3)
    val anchor1 = maxTsUs + 36000L * 1000000L          // +10 h
    val anchor2 = anchor1 + 36000L * 1000000L          // +20 h
    pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          subject = Some(r.getString(1)),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(3))
      } :+ (AmqpMessage(messageId = Some("a1"), subject = Some("zz_anchor1"),
          body = AmqpValueBody("0")), anchor1))
    withRocksDb(s) {
      val ckpt = java.nio.file.Files.createTempDirectory("graft-tws-timer-gate").toString
      val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
      def drain(): Unit = {
        val env = s.readStream.format("amqp")
          .option("endpoint", ep).option("address", address).load()
          .withColumn("cents",
            (col("body").cast(DecimalType(18, 2)) * 100).cast(IntegerType))
        val q = graft.streaming.AmqpStreamOps
          .sessionFlushTws(env, "subject", "cents", gapMs = 1800000L)
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[graft.streaming.AmqpStreamOps.SessionFlush],
             _: Long) =>
              val got = b.collect().map(f => (f.key, f.n_events, f.sum_value))
              emitted.synchronized { emitted ++= got }
              ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try require(q.awaitTermination(120000), "tws-timer gate query hung")
        finally q.stop()
      }
      drain() // phase 1: data + anchor1 — most sessions flush here
      // phase 2: restart from the checkpoint; anchor2's batch carries
      // phase 1's watermark forward and fires every timer still armed
      // (including any tail session phase 1's no-data batch missed)
      pumpAll(client, address, Seq((AmqpMessage(messageId = Some("a2"),
        subject = Some("zz_anchor2"), body = AmqpValueBody("0")), anchor2)))
      drain()
      emitted.toSeq
        .filterNot(_._1.startsWith("zz_anchor"))
        .toDF("event_type", "n_events", "sum_cents")
    }
  }

  val amqpStreamTwsTimerSql: String =
    """WITH f AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS INTEGER) AS cents,
      |    epoch_us(ts) // 1000000 AS ts_s, event_id
      |  FROM events WHERE event_id % 11 = 5),
      |flags AS (
      |  SELECT event_type, cents, ts_s, event_id,
      |    CASE WHEN ts_s - lag(ts_s) OVER
      |           (PARTITION BY event_type ORDER BY ts_s, event_id) > 1800
      |         THEN 1 ELSE 0 END AS brk
      |  FROM f),
      |sessed AS (
      |  SELECT event_type, cents,
      |    sum(brk) OVER (PARTITION BY event_type ORDER BY ts_s, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM flags)
      |SELECT event_type, CAST(count(*) AS INTEGER) AS n_events,
      |  CAST(sum(cents) AS INTEGER) AS sum_cents
      |FROM sessed GROUP BY event_type, sess_id""".stripMargin

  // ---------------------------------------------- amqp_shared_consumers
  /** SHARED SUBSCRIPTION under the oracle gate: TWO CONCURRENT consuming
    * streams in one share group drain one address over the tcp:// wire
    * (claims, renewals, and per-claim settlement all crossing the
    * socket), and the UNION of their outputs must hash-match the oracle
    * EXACTLY ONCE — a double-dispatched slice duplicates rows, a dropped
    * or stranded claim loses them, and either breaks the hash. The
    * consumer-fleet-on-one-queue topology the single-consumer source
    * correctly refuses (a second consumer there is detected as data
    * loss); see [[graft.streaming.AmqpSharedMicroBatchStream]].
    *
    * Both consumers start BEFORE the pump and poll concurrently with a
    * trigger budget of ~1/6 of the slice, so the drain genuinely
    * interleaves (a structural `require` pins that both consumed > 0 —
    * the split itself is scheduling-dependent and stays off the hash).
    *
    * Scale shape: admission is one claim RPC per trigger per consumer
    * (O(1) ledger arithmetic broker-side); adding consumers divides the
    * backlog without coordination among them — the broker's lease
    * ledger is the only shared state. Since r9 the gate also runs under
    * the `minMessagesPerTrigger`/`maxTriggerDelay` admission floor
    * (Kafka ReadMinRows parity) — held tails must still land exactly
    * once. */
  def amqpSharedConsumers(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    import s.implicits._
    val ep = tcpGateEndpoint
    val client = AmqpEndpointRegistry.endpoint(ep)
    val address = s"jobs-${sharedGateRun.incrementAndGet()}"
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 11 === 9)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect()
    require(rows.nonEmpty, "shared-consumers gate slice is empty")
    val scratch = java.nio.file.Files.createTempDirectory("graft-shared-gate")
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, String, Int)]()
    val perTrigger = math.max(20, rows.length / 6)
    def consumer(idx: Int) =
      s.readStream.format("amqp")
        .option("endpoint", ep).option("address", address)
        .option("sharedGroup", "workers")
        .option("maxMessagesPerTrigger", perTrigger.toString)
        // the gate runs UNDER the min-rows admission floor (Kafka
        // minOffsetsPerTrigger/maxTriggerDelay parity): claims below 20
        // available rows hold until the 1s ceiling — the floor is on the
        // hash path, so an admission bug that drops or re-claims the
        // held tail breaks the oracle
        .option("minMessagesPerTrigger", "20")
        .option("maxTriggerDelay", "1s")
        .load()
        .withColumn("cents",
          (col("body").cast(DecimalType(18, 2)) * 100).cast(IntegerType))
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$scratch/ckpt$idx")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select(col("message_id"), col("subject"), col("cents")).collect()
            .foreach(r => emitted.add((idx, r.getString(0), r.getString(1), r.getInt(2))))
          ()
        }
        .start()
    val q1 = consumer(1)
    val q2 = consumer(2)
    try {
      pumpAll(client, address, rows.toSeq.map { r =>
          (AmqpMessage(
            messageId = Some(r.getLong(0).toString),
            subject = Some(r.getString(1)),
            body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(0))
        })
      // double pass: each consumer's first return can precede the
      // other's in-flight claims; after the second, nothing is
      // dispatchable and every claimed batch is sunk (see the stream's
      // doc for why no fresh claim can slip in after that)
      q1.processAllAvailable(); q2.processAllAvailable()
      q1.processAllAvailable(); q2.processAllAvailable()
      // the tail below the min-rows floor is HELD by admission (so
      // processAllAvailable can return before it lands) and fires at
      // the 1s delay ceiling — the continuous triggers keep polling
      val deadline = System.currentTimeMillis() + 60000
      while (emitted.size < rows.length && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    } finally { q1.stop(); q2.stop() }
    import scala.jdk.CollectionConverters._
    val got = emitted.asScala.toSeq
    require(got.map(_._1).toSet == Set(1, 2),
      s"work-sharing degenerated to one consumer: split " +
        s"${got.groupBy(_._1).view.mapValues(_.size).toMap}")
    got.map { case (_, id, et, c) => (id, et, c) }
      .toDF("message_id", "event_type", "cents")
  }

  val amqpSharedConsumersSql: String =
    """SELECT CAST(event_id AS VARCHAR) AS message_id, event_type,
      |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS INTEGER) AS cents
      |FROM events WHERE event_id % 11 = 9""".stripMargin

  // --------------------------------------------------- amqp_shared_wire
  /** SHARED SUBSCRIPTION over the INTEROPERABLE WIRE: the same
    * two-concurrent-consumers contract as amqp_shared_consumers, but
    * every claim, renewal, per-claim settlement, and fetch crosses REAL
    * AMQP 1.0 framing (claim RPCs ride probe attaches —
    * [[graft.streaming.Amqp10Wire.ShareGroupProp]]) — the consumer-fleet
    * topology against an actual AMQP 1.0 broker endpoint, which r8 could
    * only run on the engine's compact RPC transport. The union of both
    * consumers' outputs must hash the oracle exactly once: a claim
    * triple corrupted in wire encode/decode double-reads or drops rows,
    * and either breaks the hash.
    *
    * Scale shape: identical to the tcp:// gate — admission is one probe
    * attach per trigger per consumer (O(1) ledger arithmetic
    * broker-side), reads are per-claim drain slices on pooled
    * per-reader connections; the wire adds framing, never coordination. */
  def amqpSharedWire(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    import s.implicits._
    val ep = wireGateEndpoint
    val client = AmqpEndpointRegistry.endpoint(ep)
    val address = s"wirejobs-${sharedGateRun.incrementAndGet()}"
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 13 === 4)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect()
    require(rows.nonEmpty, "shared-wire gate slice is empty")
    val scratch = java.nio.file.Files.createTempDirectory("graft-shared-wire-gate")
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, String, Int)]()
    val perTrigger = math.max(20, rows.length / 6)
    def consumer(idx: Int) =
      s.readStream.format("amqp")
        .option("endpoint", ep).option("address", address)
        .option("sharedGroup", "wire-workers")
        .option("maxMessagesPerTrigger", perTrigger.toString)
        .load()
        .withColumn("cents",
          (col("body").cast(DecimalType(18, 2)) * 100).cast(IntegerType))
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$scratch/ckpt$idx")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select(col("message_id"), col("subject"), col("cents")).collect()
            .foreach(r => emitted.add((idx, r.getString(0), r.getString(1), r.getInt(2))))
          ()
        }
        .start()
    val q1 = consumer(1)
    val q2 = consumer(2)
    try {
      pumpAll(client, address, rows.toSeq.map { r =>
          (AmqpMessage(
            messageId = Some(r.getLong(0).toString),
            subject = Some(r.getString(1)),
            body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(0))
        })
      // double pass, same as the tcp gate: each consumer's first return
      // can precede the other's in-flight claims
      q1.processAllAvailable(); q2.processAllAvailable()
      q1.processAllAvailable(); q2.processAllAvailable()
    } finally { q1.stop(); q2.stop() }
    import scala.jdk.CollectionConverters._
    val got = emitted.asScala.toSeq
    require(got.map(_._1).toSet == Set(1, 2),
      s"work-sharing degenerated to one consumer: split " +
        s"${got.groupBy(_._1).view.mapValues(_.size).toMap}")
    got.map { case (_, id, et, c) => (id, et, c) }
      .toDF("message_id", "event_type", "cents")
  }

  val amqpSharedWireSql: String =
    """SELECT CAST(event_id AS VARCHAR) AS message_id, event_type,
      |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS INTEGER) AS cents
      |FROM events WHERE event_id % 13 = 4""".stripMargin

  // ------------------------------------------------- amqp_stream_minrows
  /** MIN-ROWS ADMISSION on the hash path (`minMessagesPerTrigger` +
    * `maxTriggerDelay`, Kafka ReadMinRows parity, single-consumer
    * stream): the gate drains a pumped slice under a floor of 10 rows
    * and a 1 s delay ceiling — batches below the floor are HELD by
    * admission (the structural require pins that every batch except
    * the ceiling-fired tail carried at least the floor) and the tail
    * fires at the ceiling rather than hanging, so the full slice must
    * still land EXACTLY ONCE under the oracle hash: an admission bug
    * that drops, re-admits, or double-counts a held tail breaks it.
    * Runs over the amqp10:// wire like its siblings.
    *
    * Scale shape: the floor only REMOVES triggers (batching trickle
    * streams); admission stays O(1) ledger arithmetic per trigger —
    * what changes is per-trigger overhead amortization, which is the
    * point. */
  def amqpStreamMinrows(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    import s.implicits._
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 23 === 3)
      .select(col("event_id"), col("value"))
      .collect()
    require(rows.nonEmpty, "minrows gate slice is empty")
    pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          body = AmqpValueBody(r.getDouble(1).toString)), r.getLong(0))
      })
    val scratch = java.nio.file.Files.createTempDirectory("graft-minrows-gate")
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int)]()
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val q = s.readStream.format("amqp")
      .option("endpoint", ep).option("address", address)
      .option("minMessagesPerTrigger", "10")
      .option("maxTriggerDelay", "1s")
      .option("maxMessagesPerTrigger", math.max(15, rows.length / 4).toString)
      .load()
      .withColumn("cents",
        (col("body").cast(DecimalType(18, 2)) * 100).cast(IntegerType))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$scratch/ckpt")
      .foreachBatch { (b: DataFrame, _: Long) =>
        val got = b.select(col("message_id"), col("cents")).collect()
          .map(r => (r.getString(0), r.getInt(1)))
        if (got.nonEmpty) batchSizes.add(got.length)
        got.foreach(emitted.add)
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      // a tail below the floor is HELD by admission (processAllAvailable
      // can return before it lands) and fires at the 1 s ceiling
      val deadline = System.currentTimeMillis() + 60000
      while (emitted.size < rows.length && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val sizes = batchSizes.asScala.toSeq
    require(sizes.dropRight(1).forall(_ >= 10),
      s"every batch but the ceiling-fired tail must carry the floor: $sizes")
    emitted.asScala.toSeq.toDF("message_id", "cents")
  }

  val amqpStreamMinrowsSql: String =
    """SELECT CAST(event_id AS VARCHAR) AS message_id,
      |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS INTEGER) AS cents
      |FROM events WHERE event_id % 23 = 3""".stripMargin

  // ------------------------------------------------- amqp_shared_pattern
  /** PATTERN SUBSCRIPTION x SHARED GROUP — the two fleet features
    * composed: `addressPattern` DISCOVERS a fleet of queues (never named
    * in the query), `sharedGroup` work-shares EACH of them across two
    * concurrent consumers, and a third queue created MID-STREAM joins
    * the shared subscription at the next trigger's discovery probe —
    * all over real AMQP 1.0 framing (discovery probe + claim RPCs on
    * the wire). The union of both consumers' outputs must hash the
    * whole 3-shard slice exactly once: a queue missed by discovery
    * loses its shard, a double-dispatched claim duplicates, a
    * mid-stream queue read from anywhere but its start breaks counts.
    * Structural requires pin that both consumers worked AND that the
    * mid-stream shard arrived.
    *
    * Scale shape: discovery is one driver-side probe per trigger per
    * consumer (a listing, like file-source discovery); each discovered
    * address claims independently, so queues x consumers parallelize
    * with zero coordination beyond the broker's lease ledger. */
  def amqpSharedPattern(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    import s.implicits._
    val ep = wireGateEndpoint
    val client = AmqpEndpointRegistry.endpoint(ep)
    val base = s"fleet${sharedGateRun.incrementAndGet()}"
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 7 === 5)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect()
    require(rows.length >= 12, "shared-pattern gate slice too small")
    def msgs(pred: Long => Boolean) =
      rows.toSeq.filter(r => pred(r.getLong(0))).map { r =>
        (AmqpMessage(messageId = Some(r.getLong(0).toString),
          subject = Some(r.getString(1)),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(0))
      }
    // shards 0 and 1 exist before the consumers; shard 2 is pumped
    // mid-stream into a BRAND-NEW queue the pattern must then discover
    pumpAll(client, s"$base-shard0", msgs(_ % 3 == 0))
    pumpAll(client, s"$base-shard1", msgs(_ % 3 == 1))
    val scratch = java.nio.file.Files.createTempDirectory("graft-shared-pattern-gate")
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, String, Int)]()
    val perTrigger = math.max(10, rows.length / 12)
    def consumer(idx: Int) =
      s.readStream.format("amqp")
        .option("endpoint", ep)
        .option("addressPattern", s"$base-*")
        .option("sharedGroup", "fleet-workers")
        .option("maxMessagesPerTrigger", perTrigger.toString)
        .load()
        .withColumn("cents",
          (col("body").cast(DecimalType(18, 2)) * 100).cast(IntegerType))
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$scratch/ckpt$idx")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select(col("message_id"), col("subject"), col("cents")).collect()
            .foreach(r => emitted.add((idx, r.getString(0), r.getString(1), r.getInt(2))))
          ()
        }
        .start()
    val q1 = consumer(1)
    val q2 = consumer(2)
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      // the mid-stream queue: created (first message) while both
      // consumers run; the next trigger's discovery probe picks it up
      pumpAll(client, s"$base-shard2", msgs(_ % 3 == 2))
      q1.processAllAvailable(); q2.processAllAvailable()
      q1.processAllAvailable(); q2.processAllAvailable()
    } finally { q1.stop(); q2.stop() }
    import scala.jdk.CollectionConverters._
    val got = emitted.asScala.toSeq
    require(got.map(_._1).toSet == Set(1, 2),
      s"work-sharing degenerated to one consumer: split " +
        s"${got.groupBy(_._1).view.mapValues(_.size).toMap}")
    val shard2 = rows.map(_.getLong(0)).filter(_ % 3 == 2).map(_.toString).toSet
    require(shard2.subsetOf(got.map(_._2).toSet),
      "the mid-stream queue's shard must join the shared subscription")
    got.map { case (_, id, et, c) => (id, et, c) }
      .toDF("message_id", "event_type", "cents")
  }

  val amqpSharedPatternSql: String =
    """SELECT CAST(event_id AS VARCHAR) AS message_id, event_type,
      |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS INTEGER) AS cents
      |FROM events WHERE event_id % 7 = 5""".stripMargin

  // -------------------------------------------------- amqp_shared_poison
  /** POISON-MESSAGE ceiling + DLQ under the oracle gate (JMS
    * max-delivery-count semantics on the share-group ledger): a planted
    * poison message — the slice's FIRST row — crashes its consumer on
    * every delivery. Three consumer incarnations (fresh checkpoints =
    * fresh owners, `maxMessagesPerTrigger=1` so the poison claim is
    * exactly one message) each claim it, crash, and let the lease lapse;
    * the FOURTH consumer's first claim trips the broker's ceiling — the
    * poison routes to the DLQ annotated `x-opt-dlq-reason=max-deliveries`
    * / `-deliveries=3` (require'd) and the remaining backlog drains
    * exactly-once under a normal trigger budget. The hash covers both
    * lanes: every good row tagged 'ok' exactly once, the poison row
    * tagged 'dlq' — a premature ceiling (good rows in the DLQ), a
    * ceiling that never fires (the gate would hang), a double-delivered
    * survivor, or missing DLQ annotations each break it. Everything —
    * policy RPC, claims, renewals, settlement, DLQ readback — crosses
    * real AMQP 1.0 framing.
    *
    * Scale shape: delivery counts are per-slice ledger integers (O(live
    * claims) broker state); the ceiling check is O(1) at dispatch; DLQ
    * routing moves exactly the poison slice's rows. A crashing consumer
    * fleet converges instead of looping — redelivery cost is bounded by
    * maxDeliveries, never wall-clock. */
  def amqpSharedPoison(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    import s.implicits._
    val ep = wireGateEndpoint
    val client = AmqpEndpointRegistry.endpoint(ep)
    val address = s"poison-${sharedGateRun.incrementAndGet()}"
    val dlqAddr = s"$address-dlq"
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 331 === 7)
      .select(col("event_id"), col("value"))
      .orderBy(col("event_id"))
      .collect()
    require(rows.length >= 2, "poison gate needs a poison row plus survivors")
    val poisonId = rows.head.getLong(0).toString // min event_id: pumped FIRST
    pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          body = AmqpValueBody(r.getDouble(1).toString)), r.getLong(0))
      })
    val scratch = java.nio.file.Files.createTempDirectory("graft-poison-gate")
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int)]()
    // Lease sizing (optimization round): the gate's correctness needs only
    // (a) the lease to OUTLIVE claim->read->crash inside one incarnation —
    // and even a lapse there is rescued at the SAME delivery count
    // (InMemoryAmqpBroker.renewClaims: rescue is the same delivery
    // resuming), with no competing consumer to steal the slice — and
    // (b) the post-crash sleep to outlive the lease so the next
    // incarnation sees the slice as redeliverable. 500 ms keeps both with
    // the same sleep/lease margin the gate always had; the three crash
    // incarnations' fixed wall-clock drops from 3x1.4s to 3x0.8s.
    val leaseMs = 500L
    def consume(run: Int, perTrigger: Long): Unit = {
      val q = s.readStream.format("amqp")
        .option("endpoint", ep).option("address", address)
        .option("sharedGroup", "poison-workers")
        .option("sharedLeaseMillis", leaseMs.toString)
        .option("sharedMaxDeliveries", "3")
        .option("sharedDeadLetterAddress", dlqAddr)
        .option("maxMessagesPerTrigger", perTrigger.toString)
        .load()
        .withColumn("cents",
          (col("body").cast(DecimalType(18, 2)) * 100).cast(IntegerType))
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$scratch/ckpt$run") // fresh owner
        .foreachBatch { (b: DataFrame, _: Long) =>
          val got = b.select(col("message_id"), col("cents")).collect()
            .map(r => (r.getString(0), r.getInt(1)))
          // the poison message kills its consumer BEFORE any durable
          // output (its claim stays unsettled — the redelivery path)
          if (got.exists(_._1 == poisonId))
            throw new RuntimeException(s"poison message $poisonId")
          got.foreach(emitted.add)
          ()
        }
        .start()
      try {
        if (run <= 3) {
          // crashing incarnations: the first trigger claims exactly the
          // poison row and dies; awaitTermination surfaces the crash
          val died = intercept2(q.awaitTermination(120000))
          require(died, s"run $run should have crashed on the poison message")
        } else {
          q.processAllAvailable()
        }
      } finally q.stop()
      // the orphan lease lapses; +500 ms absolute margin (ADVICE r9: a
      // 300 ms margin sits inside GC/scheduler jitter on a loaded host —
      // the wall-clock cost of widening it is 3×0.2 s)
      if (run <= 3) Thread.sleep(leaseMs + 500)
    }
    (1 to 3).foreach(consume(_, perTrigger = 1))
    consume(4, perTrigger = math.max(20L, rows.length / 5L))
    // DLQ readback over the same wire: exactly the poison row, annotated
    val dlq = s.read.format("amqp")
      .option("endpoint", ep).option("address", dlqAddr)
      .load()
      .select(col("message_id"),
        (col("body").cast(DecimalType(18, 2)) * 100).cast(IntegerType).as("cents"),
        col("message_annotations"))
      .collect()
    require(dlq.length == 1 && dlq.head.getString(0) == poisonId,
      s"exactly the poison row must dead-letter: ${dlq.map(_.getString(0)).toSeq}")
    val anns = dlq.head.getMap[String, String](2)
    require(anns.get("x-opt-dlq-reason").contains("max-deliveries") &&
      anns.get("x-opt-dlq-deliveries").contains("3"),
      s"DLQ annotations must carry reason + count: $anns")
    import scala.jdk.CollectionConverters._
    val ok = emitted.asScala.toSeq.map { case (id, c) => (id, c, "ok") }
    (ok :+ ((poisonId, dlq.head.getInt(1), "dlq")))
      .toDF("message_id", "cents", "lane")
  }

  /** True iff `body` threw (the crashed-incarnation assertion helper —
    * scalatest's intercept is not available in main). */
  private def intercept2(body: => Any): Boolean =
    try { body; false } catch { case _: Throwable => true }

  val amqpSharedPoisonSql: String =
    """WITH s AS (SELECT event_id, value FROM events WHERE event_id % 331 = 7),
      |p AS (SELECT min(event_id) AS pid FROM s)
      |SELECT CAST(event_id AS VARCHAR) AS message_id,
      |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS INTEGER) AS cents,
      |  CASE WHEN event_id = (SELECT pid FROM p) THEN 'dlq' ELSE 'ok' END AS lane
      |FROM s""".stripMargin

  // ----------------------------------------------- amqp_stream_from_seq
  /** SEQUENCE-anchored stream start under the oracle gate (Kafka
    * `startingOffsets`-by-position parity, the positional sibling of
    * `amqp_stream_from_ts`): a NEW streaming query with
    * `startingSequence = |slice|/3` must consume EXACTLY the suffix
    * after that position over the amqp10:// wire — an off-by-one at
    * the exclusive boundary, a silent full-backlog drain, or an
    * anchor that drifted under the admission budget each break the
    * hash (count, integer cents, and the exact min/max ids of the
    * suffix are all hashed). The pump sends in ascending event_id
    * order, so sequence i IS the i-th smallest id and the oracle
    * replays the cut as a window row_number.
    *
    * Scale shape: a position cut is O(1) planning arithmetic per link
    * — no probe, no fetch of the skipped prefix (unlike the timestamp
    * anchor there is nothing to look up); the replay/ops shape for
    * "resume from the position that run X logged". */
  def amqpStreamFromSeq(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 7 === 0)
      .select(col("event_id"), col("value"))
      .orderBy(col("event_id"))
      .collect()
    require(rows.length >= 6, "from-seq gate slice too small")
    pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          body = AmqpValueBody(r.getDouble(1).toString)), r.getLong(0))
      })
    val anchor = rows.length / 3 // exclusive: skip the first third
    val ckpt = java.nio.file.Files.createTempDirectory("graft-from-seq-gate").toString
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = s.readStream.format("amqp")
      .option("endpoint", ep).option("address", address)
      .option("startingSequence", anchor.toString)
      .load()
      .select(col("message_id"), col("body"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val got = b.collect().map(r => (r.getString(0), r.getString(1)))
        emitted.synchronized { emitted ++= got }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(120000), "from-seq gate query hung")
    finally q.stop()
    import s.implicits._
    emitted.toSeq.toDF("message_id", "body")
      .agg(count(lit(1)).as("n_msgs"),
        sum((col("body").cast(DecimalType(18, 2)) * 100).cast(LongType)).as("sum_cents"),
        min(col("message_id").cast(LongType)).as("min_id"),
        max(col("message_id").cast(LongType)).as("max_id"))
  }

  val amqpStreamFromSeqSql: String =
    """WITH s AS (
      |  SELECT event_id, value,
      |    row_number() OVER (ORDER BY event_id) AS rn,
      |    count(*) OVER () AS total
      |  FROM events WHERE event_id % 7 = 0)
      |SELECT CAST(count(*) AS BIGINT) AS n_msgs,
      |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |    AS sum_cents,
      |  min(event_id) AS min_id, max(event_id) AS max_id
      |FROM s WHERE rn > total // 3""".stripMargin

  // ----------------------------------------------- amqp_window_read
  /** BOUNDED WINDOW batch read (Kafka batch `startingOffsets` +
    * `endingOffsets` parity): `startingSequence`/`endingSequence`
    * together scan exactly one positional span — "re-read exactly run
    * X's window" — with both cuts pure planning arithmetic (nothing
    * below or above the window is fetched). The gate reads the middle
    * third of a pumped slice over the amqp10:// wire and hashes its
    * exact count, integer cents, and boundary ids — an off-by-one at
    * either cut (start exclusive, end inclusive) breaks it.
    *
    * Scale shape: window cost is the window's rows, independent of
    * backlog depth on either side; the audit/backfill read a message
    * fabric runs against its retention span. */
  def amqpWindowRead(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 9 === 1)
      .select(col("event_id"), col("value"))
      .orderBy(col("event_id"))
      .collect()
    require(rows.length >= 6, "window-read gate slice too small")
    pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          body = AmqpValueBody(r.getDouble(1).toString)), r.getLong(0))
      })
    val k = rows.length / 3
    s.read.format("amqp")
      .option("endpoint", ep).option("address", address)
      .option("startingSequence", k.toString) // exclusive
      .option("endingSequence", (2 * k).toString) // inclusive
      .load()
      .agg(count(lit(1)).as("n_msgs"),
        sum((col("body").cast(DecimalType(18, 2)) * 100).cast(LongType)).as("sum_cents"),
        min(col("message_id").cast(LongType)).as("min_id"),
        max(col("message_id").cast(LongType)).as("max_id"))
  }

  val amqpWindowReadSql: String =
    """WITH s AS (
      |  SELECT event_id, value,
      |    row_number() OVER (ORDER BY event_id) AS rn,
      |    count(*) OVER () AS total
      |  FROM events WHERE event_id % 9 = 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_msgs,
      |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |    AS sum_cents,
      |  min(event_id) AS min_id, max(event_id) AS max_id
      |FROM s WHERE rn > total // 3 AND rn <= 2 * (total // 3)""".stripMargin

  // ------------------------------------------------ amqp_shared_relay
  /** THE FLEET PIPELINE end to end: two shared-subscription workers
    * jointly drain one input queue, transform (drop the 'error' class,
    * tag each message with its worker), and republish through the
    * EXACTLY-ONCE AMQP sink to one output queue — competing consumers
    * composed with transactional publish, the full
    * work-queue-to-work-queue topology a consumer fleet actually runs
    * (amqp_stream_relay is this pipeline's single-consumer form;
    * amqp_shared_consumers proves the claim ledger alone). The output
    * queue is read back and hashed: a double-dispatched claim
    * double-publishes, a lost claim or a leaked 'error' message breaks
    * the counts, and a sink epoch replay would double a whole batch.
    * Both workers must have relayed (structural require; the split
    * itself is scheduling-dependent and stays off the hash).
    *
    * Scale shape: per-worker cost is its claimed share through one map
    * + a transactional stage/commit per epoch; adding workers divides
    * the input with no coordination beyond the broker's lease ledger;
    * the output queue sees \|survivors\| messages exactly once. */
  def amqpSharedRelay(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val ep = tcpGateEndpoint
    val client = AmqpEndpointRegistry.endpoint(ep)
    val run = sharedGateRun.incrementAndGet()
    val in = s"relay-in-$run"
    val out = s"relay-out-$run"
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 11 === 2)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect()
    require(rows.nonEmpty, "shared-relay gate slice is empty")
    val scratch = java.nio.file.Files.createTempDirectory("graft-shared-relay")
    val perTrigger = math.max(20, rows.length / 6)
    def worker(idx: Int) =
      s.readStream.format("amqp")
        .option("endpoint", ep).option("address", in)
        .option("sharedGroup", "relay-workers")
        .option("maxMessagesPerTrigger", perTrigger.toString)
        .load()
        .where(col("subject") =!= "error") // the scrub between queues
        .select(col("message_id"), col("subject"), col("body"),
          lit(s"w$idx").as("worker"))
        .writeStream.format("amqp")
        .option("endpoint", ep).option("address", out)
        .option("propertyColumns", "worker")
        .option("checkpointLocation", s"$scratch/ckpt$idx")
        .outputMode("append")
        .start()
    pumpAll(client, in, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          subject = Some(r.getString(1)),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(0))
      })
    val w1 = worker(1)
    val w2 = worker(2)
    try {
      w1.processAllAvailable(); w2.processAllAvailable()
      w1.processAllAvailable(); w2.processAllAvailable()
    } finally { w1.stop(); w2.stop() }
    val relayed = s.read.format("amqp")
      .option("endpoint", ep).option("address", out)
      .option("propertyColumns", "worker")
      .load()
    val fleet = relayed.select(col("worker")).distinct()
      .collect().map(_.getString(0)).toSet
    require(fleet == Set("w1", "w2"),
      s"relay fleet degenerated to one worker: $fleet")
    relayed
      .groupBy(col("subject").as("event_type"))
      .agg(count(lit(1)).as("n_msgs"),
        sum((col("body").cast(DecimalType(18, 2)) * 100).cast(LongType)).as("sum_cents"),
        min(col("message_id").cast(LongType)).as("min_id"),
        max(col("message_id").cast(LongType)).as("max_id"))
  }

  val amqpSharedRelaySql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_msgs,
      |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |    AS sum_cents,
      |  min(event_id) AS min_id, max(event_id) AS max_id
      |FROM events
      |WHERE event_id % 11 = 2 AND event_type <> 'error'
      |GROUP BY event_type""".stripMargin

  // -------------------------------------------------- amqp_shared_lag
  /** SHARE-GROUP lag report under the oracle gate — the
    * consumer-group-describe for work-sharing groups
    * ([[graft.streaming.AmqpStreamOps.sharedLagReport]]), driven into a
    * fully determined ledger state over the tcp:// wire: pump a slice,
    * lease three equal claims to three workers, settle the first
    * (work done), let the third's lease lapse (worker died), keep the
    * second live — then one atomic ledger snapshot must report exactly
    * head = |slice|, dispatch frontier at 3·|slice|/4, one live claim
    * of |slice|/4 rows, |slice|/4 rows awaiting redelivery, and
    * remaining = undispatched + leased + redeliverable. The oracle
    * replays every figure from COUNT(*) arithmetic, so the frontier
    * bookkeeping, the expiry sweep, settle-side deletion, and the
    * report's derivations all sit under the hash.
    *
    * Scale shape: one ledger-snapshot RPC per address, driver-side —
    * rows independent of backlog depth; nothing is fetched. */
  def amqpSharedLag(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val ep = tcpGateEndpoint
    val client = AmqpEndpointRegistry.endpoint(ep)
    val address = s"lag-${sharedGateRun.incrementAndGet()}"
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 13 === 2)
      .select(col("event_id")).collect().map(_.getLong(0))
    require(rows.length >= 8, "shared-lag gate slice too small")
    pumpAll(client, address, rows.toSeq.map(id =>
      (AmqpMessage(messageId = Some(id.toString),
        body = AmqpValueBody(id.toString)), id)))
    val quarter = rows.length / 4
    // worker A: leased, processed, settled
    val a = client.claim(address, "workers", "worker-a", quarter, 600000L)
    // worker B: leased, still processing (stays live)
    client.claim(address, "workers", "worker-b", quarter, 600000L)
    // worker C: leased, then DIES — a 1 ms lease lapses before the probe
    client.claim(address, "workers", "worker-c", quarter, 1L)
    client.settleClaims(address, "workers", a.map(_.claimId))
    Thread.sleep(50) // C's lease is unambiguously past
    graft.streaming.AmqpStreamOps
      .sharedLagReport(s, ep, Seq(address), "workers")
      // the per-run address is run-local; every hashed figure derives
      // from the slice size ("group" is a reserved word — use col)
      .select(col("group").as("grp"), col("head_seq"), col("dispatched_up_to"),
        col("undispatched"), col("outstanding_claims"), col("outstanding_rows"),
        col("redeliverable_rows"), col("remaining"))
  }

  val amqpSharedLagSql: String =
    """WITH n AS (
      |  SELECT count(*) AS c, count(*) // 4 AS q
      |  FROM events WHERE event_id % 13 = 2)
      |SELECT 'workers' AS grp,
      |  CAST(c AS BIGINT) AS head_seq,
      |  CAST(3 * q AS BIGINT) AS dispatched_up_to,
      |  CAST(c - 3 * q AS BIGINT) AS undispatched,
      |  CAST(1 AS BIGINT) AS outstanding_claims,
      |  CAST(q AS BIGINT) AS outstanding_rows,
      |  CAST(q AS BIGINT) AS redeliverable_rows,
      |  CAST(c - q AS BIGINT) AS remaining
      |FROM n""".stripMargin

  // ---------------------------------------------- amqp_stream_dedup_ttl
  /** STATE TTL under the oracle gate — the one `transformWithState`
    * capability no prior gate exercised (every other state variable
    * passes TTLConfig.NONE): [[graft.streaming.AmqpStreamOps
    * .dedupByIdTtlTws]] admits each message id once per TTL window,
    * suppressing copies while the RocksDB register lives and
    * RE-ADMITTING after eviction. Three phases on one checkpoint:
    *
    *  1. pump every id TWICE, drain — the duplicate collapses through
    *     the live register (state works at all);
    *  2. sleep past the TTL — the registers expire in the store;
    *  3. pump every id once more, drain (a checkpointed RESTART with
    *     changelog checkpointing on) — each id must emit AGAIN, which
    *     only happens if TTL eviction actually fired.
    *
    * Expected emissions per id: exactly 2 (phase 1 once, phase 3 once).
    * A register that never expires yields 1 (phase 3 suppressed); a
    * register that never holds yields 3 — both break the hash.
    *
    * Determinism: phase-1 copies of one id land in one micro-batch (one
    * handleInputRows call — no timing on the suppression side), and the
    * sleep is 2.5x the TTL, so the only wall-clock assumption is that a
    * 0.5 s TTL lapses within 1.25 s (plus the restart choreography between
    * the sleep and phase 3's batch, which only widens the margin; the
    * gate spent 5 s sleeping out a 2 s TTL before the optimization round
    * — the margin RATIO is what the determinism argument rests on, and
    * it is unchanged). Cross-batch within-TTL suppression is
    * timing-sensitive by nature and is spec-proven instead
    * (TtlStateSpec), keeping the gate load-immune.
    *
    * Scale shape: one boolean register per id seen within the TTL
    * window — the eviction-bounded state a forever-running dedup needs
    * (the watermark-bounded sibling is amqp_stream_dedup_wm). */
  def amqpStreamDedupTtl(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    import s.implicits._
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val ids = Tables.events(s, d)
      .filter(col("event_id") % 13 === 11)
      .select(col("event_id")).collect().map(_.getLong(0))
    require(ids.nonEmpty, "ttl-dedup gate slice is empty")
    def msgsOf(round: Int): Seq[(AmqpMessage, Long)] = ids.toSeq.map { id =>
      (AmqpMessage(messageId = Some(id.toString),
        body = AmqpValueBody(s"r$round-$id")), id)
    }
    withRocksDb(s) {
      val ckpt = java.nio.file.Files.createTempDirectory("graft-ttl-dedup-gate").toString
      val emitted = scala.collection.mutable.ArrayBuffer.empty[String]
      def drain(): Unit = {
        val env = s.readStream.format("amqp")
          .option("endpoint", ep).option("address", address).load()
        val q = graft.streaming.AmqpStreamOps
          .dedupByIdTtlTws(env, java.time.Duration.ofMillis(500))
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[graft.streaming.AmqpStreamOps.TtlDedupEmit],
             _: Long) =>
              val got = b.collect().map(_.message_id)
              emitted.synchronized { emitted ++= got }
              ()
          }
          // Trigger.Once, NOT AvailableNow: ProcessingTime time mode
          // keeps shouldRunAnotherBatch true (timers/TTL must be able
          // to advance), so AvailableNow would re-trigger forever; Once
          // runs exactly one batch per drain — each phase's backlog
          // fits it (< default maxMessagesPerTrigger), and one
          // handleInputRows call per id is the suppression determinism
          // the gate doc promises.
          .trigger(org.apache.spark.sql.streaming.Trigger.Once())
          .start()
        try require(q.awaitTermination(120000), "ttl-dedup gate query hung")
        finally q.stop()
      }
      pumpAll(client, address, msgsOf(1) ++ msgsOf(2)) // every id twice
      drain() // phase 1: duplicate suppressed by the live register
      Thread.sleep(1250) // phase 2: 2.5x the TTL — registers expire
      pumpAll(client, address, msgsOf(3))
      drain() // phase 3: restart; evicted registers re-admit every id
      emitted.groupBy(identity)
        .map { case (id, es) => (id, es.size.toLong) }
        .toSeq.toDF("message_id", "emissions")
    }
  }

  val amqpStreamDedupTtlSql: String =
    """SELECT CAST(event_id AS VARCHAR) AS message_id,
      |  CAST(2 AS BIGINT) AS emissions
      |FROM events WHERE event_id % 13 = 11""".stripMargin

  // ---------------------------------------------------------- amqp_browse
  /** BROWSE mode under the oracle gate: two independent streaming
    * queries (fresh checkpoints) read the SAME backlog with
    * `browse=true` — distribution-mode "copy", the non-destructive
    * queue-peek — and both must see every message, because a browsing
    * link never settles. If browse leaked a settle, the second query's
    * half of the union would come up empty and the hash would break
    * against the oracle's two-run cross join. The monitoring/analytics
    * consumer shape: peek a production address without consuming it.
    *
    * Scale shape: identical to the consuming path (browse only skips
    * the commit-time settle RPC); N browsers on one address cost the
    * broker one ledger, not N copies. */
  def amqpBrowse(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 9 === 4)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect() // producer role: driver-side by design (reference test senders)
    pumpAll(client, address, rows.toSeq.map { r =>
        (AmqpMessage(
          messageId = Some(r.getLong(0).toString),
          subject = Some(r.getString(1)),
          body = AmqpValueBody(r.getDouble(2).toString)), r.getLong(0))
      })
    val scratch = java.nio.file.Files.createTempDirectory("graft-browse-gate")
    def drainTo(run: Int): String = {
      val outDir = s"$scratch/out$run"
      val q = s.readStream.format("amqp")
        .option("endpoint", ep).option("address", address)
        .option("browse", "true").load()
        .select(col("subject"), col("body"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", s"$scratch/ckpt$run")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(120000), s"browse gate query $run hung")
      finally q.stop()
      outDir
    }
    val out1 = drainTo(1)
    val out2 = drainTo(2) // fresh checkpoint: the backlog must still be there
    s.read.parquet(out1).withColumn("run", lit(1))
      .unionByName(s.read.parquet(out2).withColumn("run", lit(2)))
      .select(col("run"), col("subject").as("event_type"),
        col("body").cast(DoubleType).as("value"))
      .groupBy(col("run"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
  }

  val amqpBrowseSql: String =
    """SELECT r.run, event_type, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events CROSS JOIN (VALUES (1), (2)) AS r(run)
      |WHERE event_id % 9 = 4
      |GROUP BY r.run, event_type""".stripMargin

  // ------------------------------------------------- amqp_stream_cdc_merge
  /** STREAMING CDC INTO THE LAKEHOUSE: change events (U/D/I) arrive
    * over the AMQP 1.0 wire and `foreachBatch` applies each micro-batch
    * as a COPY-ON-WRITE overlay version onto a partitioned parquet
    * snapshot chain — the end-to-end shape (queue → merge → versioned
    * table) that `fmt_merge_upsert` demonstrates for one batch and a
    * real CDC pipeline runs forever. Two pumps + two drains on one
    * checkpoint apply two disjoint changesets (even-year keys, then
    * odd-year keys); every overlay holds ONLY its touched-year
    * partitions, rewritten from the overlay-resolved current state, so
    * the final read resolves each year to its highest version. The
    * oracle replays both changesets relationally — partition routing,
    * version resolution, update arithmetic, and delete/insert
    * membership all sit under the hash. Batch-boundary-invariant by
    * construction: each merge reads the RESOLVED current state of its
    * touched years, so however AvailableNow splits a changeset the
    * chain converges to the same table.
    *
    * Scale shape: per micro-batch cost is the changeset size plus a
    * partition-pruned read+rewrite of the touched partitions — never
    * the table; version resolution is directory/manifest arithmetic on
    * the driver, bounded by |partitions|. This is the Delta/Iceberg
    * streaming-MERGE loop with directory-granularity manifests. */
  def amqpStreamCdcMerge(s: SparkSession, d: String): DataFrame = gatedStream(s, d) {
    val (ep, address) = gateTarget()
    val client = AmqpEndpointRegistry.endpoint(ep)
    // deterministic scratch (like FormatQueries.scratch): warm Bench /
    // Verify runs and the spec's repeat runs reuse one dir instead of
    // leaking a table-sized version chain per invocation
    val scratch = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_cdc_merge_${d.replaceAll("[^A-Za-z0-9]", "_")}").toString
    def rmTree(f: java.io.File): Unit = if (f.exists()) {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmTree)
      require(f.delete(), s"could not clear prior cdc scratch $f")
    }
    rmTree(new java.io.File(scratch)) // prior chain + checkpoint must not bleed in

    // snapshot v1: orders keyed to integer cents, partitioned by year
    val base = Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast(IntegerType).as("yr"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType).as("cents"))
    // hash-cluster by the partition key before the partitioned write
    // (guide §6): parallel per-year encode, one file per partition
    base.repartition(col("yr"))
      .write.mode("overwrite").partitionBy("yr").parquet(s"$scratch/v1")

    // version chain bookkeeping (the "manifest"): vN dirs, highest wins
    val nextVersion = new java.util.concurrent.atomic.AtomicInteger(1)
    def versions(): Seq[(Int, String)] =
      new java.io.File(scratch).listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
        .map(f => f.getName.drop(1).toInt -> f.getPath).sortBy(-_._1)
    def yearsOf(dir: String): Set[Int] =
      new java.io.File(dir).listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("yr="))
        .map(_.getName.stripPrefix("yr=").toInt).toSet
    /** Overlay-first read: each year resolves to its highest version. */
    def resolvedRead(): DataFrame = {
      var seen = Set.empty[Int]
      versions().map { case (_, dir) =>
        val mine = yearsOf(dir) -- seen
        seen ++= yearsOf(dir)
        s.read.parquet(dir)
          .filter(col("yr").isin(mine.toSeq.map(Integer.valueOf): _*))
      }.reduce(_ unionByName _)
    }

    // the CDC changesets, derived from the source-of-record: U = +10%
    // cents (producer ships the NEW value), D = delete, I = fresh
    // negative key. Changeset A touches even years, B odd years.
    val cdc = base.filter(col("o_orderkey") % 50 <= 2)
      .select(
        when(col("o_orderkey") % 50 === 0, lit("U"))
          .when(col("o_orderkey") % 50 === 1, lit("D"))
          .otherwise(lit("I")).as("op"),
        when(col("o_orderkey") % 50 === 2, -col("o_orderkey"))
          .otherwise(col("o_orderkey")).as("key"),
        col("yr"),
        when(col("o_orderkey") % 50 === 0, col("cents") + expr("cents div 10"))
          .otherwise(col("cents")).as("cents"))
      .collect() // producer role: driver-side by design (reference test senders)
    def pump(evenYears: Boolean): Unit =
      pumpAll(client, address, cdc.toSeq
        .filter(r => (r.getInt(2) % 2 == 0) == evenYears)
        .map { r =>
          (AmqpMessage(
            messageId = Some(s"${r.getString(0)}:${r.getLong(1)}"),
            subject = Some(r.getString(0)),
            body = AmqpValueBody(s"${r.getLong(1)},${r.getInt(2)},${r.getLong(3)}")),
            r.getLong(1))
        })

    val ckpt = s"$scratch/ckpt"
    def drain(): Unit = {
      val reader = s.readStream.format("amqp")
        .option("endpoint", ep).option("address", address)
      // test hook: shrink micro-batches so one changeset splits across
      // several merges — the spec proves the chain converges anyway
      val q = sys.props.get("graft.cdc.maxPerTrigger")
        .fold(reader)(n => reader.option("maxMessagesPerTrigger", n))
        .load()
        .select(col("subject").as("op"), split(col("body"), ",").as("f"))
        .select(col("op"), col("f").getItem(0).cast(LongType).as("o_orderkey"),
          col("f").getItem(1).cast(IntegerType).as("yr"),
          col("f").getItem(2).cast(LongType).as("cents"))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val ops = b.persist()
          try {
            val touched = ops.select("yr").distinct()
              .collect().map(_.getInt(0)).sorted
            if (touched.nonEmpty) {
              // anti-join ALL changed keys (I included): inserts land as
              // upserts, so a foreachBatch RETRY that re-applies a batch
              // whose overlay already committed stays idempotent instead
              // of double-inserting the I rows
              val dead = ops.select("o_orderkey", "yr")
              val upserts = ops.filter(col("op").isin("U", "I"))
                .select("o_orderkey", "yr", "cents")
              val v = nextVersion.incrementAndGet()
              resolvedRead()
                .filter(col("yr").isin(touched.map(Integer.valueOf): _*))
                .join(dead, Seq("o_orderkey", "yr"), "left_anti")
                .unionByName(upserts)
                .write.mode("overwrite").partitionBy("yr")
                .parquet(s"$scratch/v$v")
            }
          } finally ops.unpersist()
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(120000), "cdc-merge gate query hung")
      finally q.stop()
    }

    pump(evenYears = true); drain()
    pump(evenYears = false); drain()
    require(versions().size >= 3,
      s"two drains must have produced overlays: ${versions().map(_._2)}")
    versions().dropRight(1).foreach { case (_, dir) =>
      require(yearsOf(dir).nonEmpty, s"empty overlay $dir") }

    resolvedRead()
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
  }

  val amqpStreamCdcMergeSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |merged AS (
      |  SELECT o_orderkey, yr,
      |    CASE WHEN o_orderkey % 50 = 0 THEN cents + cents // 10 ELSE cents END AS cents
      |  FROM base WHERE o_orderkey % 50 <> 1
      |  UNION ALL
      |  SELECT -o_orderkey, yr, cents FROM base WHERE o_orderkey % 50 = 2)
      |SELECT yr, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM merged GROUP BY yr""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "amqp_browse"           -> (amqpBrowse _),
    "amqp_stream_cdc_merge" -> (amqpStreamCdcMerge _),
    "amqp_property_pushdown" -> (amqpPropertyPushdown _),
    "amqp_stream_tws"       -> (amqpStreamTws _),
    "amqp_count_pushdown"   -> (amqpCountPushdown _),
    "amqp_filter_pushdown"  -> (amqpFilterPushdown _),
    "amqp_stream_from_ts"   -> (amqpStreamFromTs _),
    "amqp_stream_parquet"   -> (amqpStreamParquet _),
    "amqp_stream_corpus"    -> (amqpStreamCorpus _),
    "amqp_stream_join2"     -> (amqpStreamJoin2 _),
    "amqp_stream_join2_outer" -> (amqpStreamJoin2Outer _),
    "amqp_stream_join2_full"  -> (amqpStreamJoin2Full _),
    "amqp_sink_roundtrip"   -> (amqpSinkRoundtrip _),
    "amqp_stream_state"     -> (amqpStreamState _),
    "amqp_ingest_roundtrip" -> (amqpIngestRoundtrip _),
    "amqp_sql_table"        -> (amqpSqlTable _),
    "amqp_pattern_multi"    -> (amqpPatternMulti _),
    "amqp_stream_pattern"   -> (amqpStreamPattern _),
    "amqp_stream_relay"     -> (amqpStreamRelay _),
    "amqp_ttl_expiry" -> (amqpTtlExpiry _),
    "amqp_dead_letter" -> (amqpDeadLetter _),
    "amqp_request_reply" -> (amqpRequestReply _),
    "amqp_lag_report" -> (amqpLagReport _),
    "amqp_stream_leaderboard" -> (amqpStreamLeaderboard _),
    "amqp_stream_distinct" -> (amqpStreamDistinct _),
    "amqp_stream_ttl" -> (amqpStreamTtl _),
    "amqp_stream_window"    -> (amqpStreamWindow _),
    "amqp_stream_dedup"     -> (amqpStreamDedup _),
    "amqp_stream_dedup_wm"  -> (amqpStreamDedupWm _),
    "amqp_stream_join"      -> (amqpStreamJoin _),
    "amqp_stream_session"   -> (amqpStreamSession _),
    "amqp_stream_tws_timer" -> (amqpStreamTwsTimer _),
    "amqp_stream_dedup_ttl" -> (amqpStreamDedupTtl _),
    "amqp_shared_consumers" -> (amqpSharedConsumers _),
    "amqp_shared_wire"      -> (amqpSharedWire _),
    "amqp_shared_poison"    -> (amqpSharedPoison _),
    "amqp_shared_pattern"   -> (amqpSharedPattern _),
    "amqp_stream_minrows"   -> (amqpStreamMinrows _),
    "amqp_typed_property"   -> (amqpTypedProperty _),
    "amqp_shared_lag"       -> (amqpSharedLag _),
    "amqp_stream_from_seq"  -> (amqpStreamFromSeq _),
    "amqp_window_read"      -> (amqpWindowRead _),
    "amqp_shared_relay"     -> (amqpSharedRelay _),
    "amqp_stream_late"      -> (amqpStreamLate _))

  val oracleSql: Map[String, String] = Map(
    "amqp_browse"           -> amqpBrowseSql,
    "amqp_stream_cdc_merge" -> amqpStreamCdcMergeSql,
    "amqp_property_pushdown" -> amqpPropertyPushdownSql,
    "amqp_stream_tws"       -> amqpStreamTwsSql,
    "amqp_count_pushdown"   -> amqpCountPushdownSql,
    "amqp_filter_pushdown"  -> amqpFilterPushdownSql,
    "amqp_stream_from_ts"   -> amqpStreamFromTsSql,
    "amqp_stream_parquet"   -> amqpStreamParquetSql,
    "amqp_stream_corpus"    -> amqpStreamCorpusSql,
    "amqp_stream_join2"     -> amqpStreamJoin2Sql,
    "amqp_stream_join2_outer" -> amqpStreamJoin2OuterSql,
    "amqp_stream_join2_full"  -> amqpStreamJoin2FullSql,
    "amqp_sink_roundtrip"   -> amqpSinkRoundtripSql,
    "amqp_stream_state"     -> amqpStreamStateSql,
    "amqp_ingest_roundtrip" -> amqpIngestRoundtripSql,
    "amqp_sql_table"        -> amqpSqlTableSql,
    "amqp_pattern_multi"    -> amqpPatternMultiSql,
    "amqp_stream_pattern"   -> amqpStreamPatternSql,
    "amqp_stream_relay"     -> amqpStreamRelaySql,
    "amqp_ttl_expiry" -> amqpTtlExpirySql,
    "amqp_dead_letter" -> amqpDeadLetterSql,
    "amqp_request_reply" -> amqpRequestReplySql,
    "amqp_lag_report" -> amqpLagReportSql,
    "amqp_stream_leaderboard" -> amqpStreamLeaderboardSql,
    "amqp_stream_distinct" -> amqpStreamDistinctSql,
    "amqp_stream_ttl" -> amqpStreamTtlSql,
    "amqp_stream_window"    -> amqpStreamWindowSql,
    "amqp_stream_dedup"     -> amqpStreamDedupSql,
    "amqp_stream_dedup_wm"  -> amqpStreamDedupWmSql,
    "amqp_stream_join"      -> amqpStreamJoinSql,
    "amqp_stream_session"   -> amqpStreamSessionSql,
    "amqp_stream_tws_timer" -> amqpStreamTwsTimerSql,
    "amqp_stream_dedup_ttl" -> amqpStreamDedupTtlSql,
    "amqp_shared_consumers" -> amqpSharedConsumersSql,
    "amqp_shared_wire"      -> amqpSharedWireSql,
    "amqp_shared_poison"    -> amqpSharedPoisonSql,
    "amqp_shared_pattern"   -> amqpSharedPatternSql,
    "amqp_stream_minrows"   -> amqpStreamMinrowsSql,
    "amqp_typed_property"   -> amqpTypedPropertySql,
    "amqp_shared_lag"       -> amqpSharedLagSql,
    "amqp_stream_from_seq"  -> amqpStreamFromSeqSql,
    "amqp_window_read"      -> amqpWindowReadSql,
    "amqp_shared_relay"     -> amqpSharedRelaySql,
    "amqp_stream_late"      -> amqpStreamLateSql)
}
