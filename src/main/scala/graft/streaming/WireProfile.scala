package graft.streaming


import Amqp10Codec._

/** Micro-profiling harness for the wire path: times payload decode,
  * frame decode/encode, framing reads, and the end-to-end drain fetch
  * separately — how the flush-per-frame bottleneck was isolated (CPU
  * decode accounted for ~0.36 s of a 0.9 s/100k drain; the rest was one
  * flush syscall + TCP_NODELAY packet per ~70-byte frame). */
object WireProfile {
  def main(args: Array[String]): Unit = {
    val n = 100000
    val payload = encodeTransferPayload(Seq(Amqp10Wire.SeqAnnotation -> 123456L,
      Amqp10Wire.TsAnnotation -> 77L),
      AmqpMessage(body = AmqpValueBody("m-12345")))
    // 1. decodeTransferPayload alone
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { decodeTransferPayload(payload); i += 1 }
      println(f"decodeTransferPayload x$n: ${(System.nanoTime() - t0) / 1e9}%.3fs (run $r)")
    }
    // 2. frame encode+decode alone (performative parse)
    val frame = Frame(FrameTypeAmqp, 0, described(Desc.Transfer, UInt(0L), UInt(1L),
      "1".getBytes, UInt(0L), java.lang.Boolean.FALSE, java.lang.Boolean.FALSE), payload)
    val fb = encodeFrame(frame)
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { decodeFrame(fb); i += 1 }
      println(f"decodeFrame x$n: ${(System.nanoTime() - t0) / 1e9}%.3fs (run $r)")
    }
    // 3. readFrame from an in-memory stream of n frames (framing + copy)
    val all = new java.io.ByteArrayOutputStream()
    (1 to n).foreach(_ => all.write(fb))
    val bytes = all.toByteArray
    (1 to 3).foreach { r =>
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { Amqp10Wire.readFrame(in); i += 1 }
      println(f"readFrame x$n: ${(System.nanoTime() - t0) / 1e9}%.3fs (run $r)")
    }
    // 4. server-side encode (pushTransfers' per-message cost)
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) {
        encodeFrame(Frame(FrameTypeAmqp, 0, described(Desc.Transfer, UInt(0L), UInt(i.toLong),
          i.toString.getBytes, UInt(0L), java.lang.Boolean.FALSE, java.lang.Boolean.FALSE), payload))
        i += 1
      }
      println(f"encodeFrame x$n: ${(System.nanoTime() - t0) / 1e9}%.3fs (run $r)")
    }
    // 5. the real end-to-end fetch for reference
    val server = new Amqp10Server(new InMemoryAmqpBroker)
    val ep = s"amqp10://127.0.0.1:${server.port}"
    try {
      val client = AmqpEndpointRegistry.endpoint(ep)
      val batch = (0 until 500).map(i => (AmqpMessage(body = AmqpValueBody(s"m-$i")), i.toLong))
      var sent = 0L; var f = 0L
      while (sent < n) {
        val acc = client.sendMany("l0", batch).count(_ >= 0)
        sent += acc
        if (acc < batch.length) { val to = client.latestSeq("l0"); client.fetch("l0", f, to); f = to }
      }
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        require(client.fetch("l0", 0, n).length == n)
        println(f"end-to-end fetch x$n: ${(System.nanoTime() - t0) / 1e9}%.3fs (run $r)")
      }
    } finally { AmqpEndpointRegistry.reset(ep); server.close() }
  }
}
