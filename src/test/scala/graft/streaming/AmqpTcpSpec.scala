package graft.streaming

import scala.concurrent.duration._

import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}

import graft.SparkSpecBase

/** Socket-transport parity: the same source/sink semantics over
  * `tcp://host:port` endpoints — broker in one place, Spark connecting
  * through a real socket, as the reference does with its Vert.x Proton
  * link (AMQPReceiver.scala:63-88 in /root/reference). */
class AmqpTcpSpec extends SparkSpecBase {

  private def poll[T](f: => T): T =
    eventually(timeout(30.seconds), interval(500.millis))(f)

  private def withServer[T](f: (InMemoryAmqpBroker, String) => T): T = {
    val backing = new InMemoryAmqpBroker
    val server = new AmqpTcpServer(backing)
    val ep = s"tcp://127.0.0.1:${server.port}"
    try f(backing, ep)
    finally { AmqpEndpointRegistry.reset(ep); server.close() }
  }

  test("client endpoint round-trips every operation over the socket") {
    withServer { (backing, ep) =>
      val client = AmqpEndpointRegistry.endpoint(ep)
      assert(client.send("addr", AmqpMessage(messageId = Some("m1"),
        body = AmqpValueBody("hello")), 42L) == 1L)
      assert(client.latestSeq("addr") == 1L)
      val Seq((seq, msg, ts)) = client.fetch("addr", 0, 1)
      assert(seq == 1L && ts == 42L)
      assert(msg.messageId.contains("m1") && msg.body == AmqpValueBody("hello"))
      client.settle("addr", 1)
      assert(client.settledUpTo("addr") == 1L)
      assert(backing.settledUpTo("addr") == 1L, "state lives in the remote broker")
      // bulk produce: one RPC round-trip for the whole batch
      val seqs = client.sendMany("bulk-addr",
        (1 to 5).map(i => (AmqpMessage(body = AmqpValueBody(s"bulk-$i")), i.toLong)))
      assert(seqs == (1L to 5L))
      assert(client.latestSeq("bulk-addr") == 5L)
      // transactional staged publish
      client.stage("t#1", 0, Seq(AmqpMessage(body = AmqpValueBody("staged"))))
      assert(client.commitStaged("t#1", "q", 1L, "addr", 43L) == 1)
      assert(client.commitStaged("t#1", "q", 1L, "addr", 43L) == -1, "idempotent epoch")
      assert(client.latestSeq("addr") == 2L)
      // timestampWindow probe (predicate-pushdown planning) over the RPC
      assert(client.timestampWindow("bulk-addr", 2L, 4L) == Some((1L, 4L)))
      assert(client.timestampWindow("bulk-addr", 9L, 10L) == Some((5L, 5L)),
        "no match: empty window anchored at the ledger head")
    }
  }

  test("reader connection pool: dedicated per borrow, reused after release, drained on reset") {
    withServer { (backing, ep) =>
      backing.send("pool-addr", AmqpMessage(body = AmqpValueBody("p1")), 1L)
      val shared = AmqpEndpointRegistry.endpoint(ep)
      val r1 = AmqpEndpointRegistry.readerEndpoint(ep)
      val r2 = AmqpEndpointRegistry.readerEndpoint(ep)
      // readers never share the cached client, nor each other (the
      // whole point: N drains proceed on N sockets)
      assert(!(r1 eq shared) && !(r2 eq shared) && !(r1 eq r2))
      assert(r1.fetch("pool-addr", 0, 1).map(_._2.body) == Seq(AmqpValueBody("p1")))
      assert(r2.fetch("pool-addr", 0, 1).map(_._2.body) == Seq(AmqpValueBody("p1")))
      // release → the same connection comes back (no redial per batch)
      AmqpEndpointRegistry.releaseReaderEndpoint(ep, r1)
      val r3 = AmqpEndpointRegistry.readerEndpoint(ep)
      assert(r3 eq r1, "released connection must be reused")
      AmqpEndpointRegistry.releaseReaderEndpoint(ep, r2)
      AmqpEndpointRegistry.releaseReaderEndpoint(ep, r3)
      // mem:// endpoints have no socket to pool: the shared broker
      val mem = AmqpEndpointRegistry.readerEndpoint("mem://pool-spec")
      assert(mem eq AmqpEndpointRegistry.endpoint("mem://pool-spec"))
      AmqpEndpointRegistry.reset("mem://pool-spec")
    }
    // after withServer's reset the pool is drained: a fresh borrow on a
    // re-registered endpoint builds a new client rather than a stale one
  }

  test("SASL-PLAIN parity: credentialed server accepts right creds, rejects wrong/anonymous") {
    val backing = new InMemoryAmqpBroker
    val server = new AmqpTcpServer(backing, credentials = Some(("alice", "s3cret")))
    try {
      backing.send("addr", AmqpMessage(body = AmqpValueBody("x")), 1L)
      // right credentials (via URI userinfo, as AmqpSourceConfig folds
      // the username/password options)
      val ok = new TcpAmqpEndpoint("127.0.0.1", server.port, Some("alice"), Some("s3cret"))
      try assert(ok.latestSeq("addr") == 1L) finally ok.close()
      // wrong password → SecurityException on first use
      val bad = new TcpAmqpEndpoint("127.0.0.1", server.port, Some("alice"), Some("nope"))
      try intercept[SecurityException](bad.latestSeq("addr")) finally bad.close()
      // anonymous against a credentialed server → refused
      val anon = new TcpAmqpEndpoint("127.0.0.1", server.port)
      try intercept[SecurityException](anon.latestSeq("addr")) finally anon.close()
    } finally server.close()
    // anonymous server accepts both anonymous AND credentialed clients
    // (the reference connects PLAIN or ANONYMOUS by option)
    withServer { (backing2, ep) =>
      backing2.send("addr", AmqpMessage(body = AmqpValueBody("y")), 1L)
      val anon = new TcpAmqpEndpoint("127.0.0.1", ep.stripPrefix("tcp://127.0.0.1:").toInt)
      try assert(anon.latestSeq("addr") == 1L) finally anon.close()
      val withCreds = AmqpEndpointRegistry.endpoint(
        s"tcp://bob:pw@127.0.0.1:${ep.stripPrefix("tcp://127.0.0.1:")}")
      assert(withCreds.latestSeq("addr") == 1L)
      AmqpEndpointRegistry.reset(s"tcp://bob:pw@127.0.0.1:${ep.stripPrefix("tcp://127.0.0.1:")}")
    }
  }

  test("username/password source options fold into the tcp endpoint URI") {
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val tcp = new CaseInsensitiveStringMap(java.util.Map.of(
      "endpoint", "tcp://h:1234", "username", "alice", "password", "pw"))
    assert(AmqpSourceConfig(tcp).endpoint == "tcp://alice:pw@h:1234")
    val mem = new CaseInsensitiveStringMap(java.util.Map.of(
      "endpoint", "mem://x", "username", "alice"))
    assert(AmqpSourceConfig(mem).endpoint == "mem://x",
      "credentials only apply to socket transports")
  }

  test("streaming read + windowed aggregate over a tcp:// endpoint") {
    withServer { (backing, ep) =>
      val base = 100L * 1000000L
      for (i <- 0 until 10)
        backing.send("my_address",
          AmqpMessage(body = AmqpValueBody((20 + i % 5).toString)),
          timestampMicros = base + i * 1000000L)
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.IntegerType
      val q = spark.readStream.format("amqp")
        .option("endpoint", ep).option("address", "my_address").load()
        .select(AmqpConverters.amqpBodyAs(IntegerType).as("temperature"),
          col("ingest_timestamp"))
        .withWatermark("ingest_timestamp", "10 seconds")
        .groupBy(window(col("ingest_timestamp"), "5 seconds"))
        .agg(max(col("temperature")).as("max_temperature"))
        .writeStream.format("memory").queryName("tcp_temps")
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        poll {
          val rows = spark.table("tcp_temps")
            .select(col("window.start").cast("long"), col("max_temperature"))
            .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
          assert(rows == Map(100L -> 24, 105L -> 24))
        }
        // settle-on-commit reaches the remote broker too
        backing.send("my_address", AmqpMessage(body = AmqpValueBody("0")))
        q.processAllAvailable()
        poll { assert(backing.settledUpTo("my_address") >= 10) }
      } finally q.stop()
    }
  }

  test("failed connect surfaces a clean error (restart-with-cause parity)") {
    // Reference: a failed initial connect restarts the receiver with
    // "Connection to AMQP address not established" (AMQPReceiver.scala:92).
    // Our pull model surfaces the connect failure to the driver/task,
    // where Spark's retry machinery plays the restart role — the error
    // must be the raw connection cause, not a hang or a swallowed null.
    val dead = new TcpAmqpEndpoint("127.0.0.1", 1) // nothing listens on port 1
    try {
      val e = intercept[java.io.IOException](dead.latestSeq("addr"))
      assert(e.getMessage != null)
    } finally dead.close()
  }

  test("client re-dials after a server drop (receiver-restart parity)") {
    // The reference restarts its receiver on TCP disconnect
    // (AMQPReceiver.scala:124-142); our link must survive a broker
    // bounce: same backing state, new server process on the same port.
    val backing = new InMemoryAmqpBroker
    // Bind BELOW the kernel's ephemeral range (32768+): an ephemeral
    // port freed by server1.close() can be handed to any unrelated
    // socket (Spark services, parallel suites) before server2 rebinds —
    // the r2 BindException flake. A fixed-range port only ever contends
    // transiently with our own close, which the retry loops absorb.
    val server1 = {
      var srv: AmqpTcpServer = null
      var p = 21347
      while (srv == null) {
        try srv = new AmqpTcpServer(backing, bindPort = p)
        catch { case _: java.net.BindException => p += 1 }
      }
      srv
    }
    val port = server1.port
    val client = new TcpAmqpEndpoint("127.0.0.1", port)
    try {
      assert(client.send("addr", AmqpMessage(body = AmqpValueBody("before")), 1L) == 1L)
      server1.close()
      val server2 = eventually(timeout(5.seconds), interval(100.millis)) {
        new AmqpTcpServer(backing, bindPort = port)
      }
      try {
        // first call after the drop re-dials, re-authenticates, retries
        assert(client.latestSeq("addr") == 1L)
        assert(client.send("addr", AmqpMessage(body = AmqpValueBody("after")), 2L) == 2L,
          "sequence continuity across the reconnect — state lives in the broker")
        val bodies = client.fetch("addr", 0, 2).map(_._2.body)
        assert(bodies == Seq(AmqpValueBody("before"), AmqpValueBody("after")))
      } finally server2.close()
    } finally client.close()
  }

  test("sink writes through tcp://; exactly-once epoch commit holds remotely") {
    withServer { (backing, ep) =>
      import spark.implicits._
      (1 to 5).map(i => s"m-$i").toDF("value")
        .repartition(3) // multiple writer partitions stage independently
        .write.format("amqp").option("endpoint", ep).option("address", "out")
        .mode("append").save()
      assert(backing.latestSeq("out") == 5)
      val bodies = backing.fetch("out", 0, 5).map(_._2.body).collect {
        case AmqpValueBody(s: String) => s
      }
      assert(bodies.toSet == (1 to 5).map(i => s"m-$i").toSet)
    }
  }
}
