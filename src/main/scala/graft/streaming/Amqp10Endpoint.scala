package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import Amqp10Codec._
import Amqp10Wire._

/** Client side of the `amqp10://` transport: an [[AmqpEndpoint]] whose
  * operations are AMQP 1.0 performative exchanges with an
  * [[Amqp10Server]] (see [[Amqp10Wire]] for the mapping). One
  * connection, one session; sender links are cached per address,
  * receiver links are attached per operation (probe / drain-fetch) and
  * detached after, like the reference's per-receiver link lifecycle
  * (AMQPReceiver.scala:97-118 in /root/reference).
  *
  * Disconnect parity (same contract as [[TcpAmqpEndpoint]]): on IO
  * failure the client re-dials — re-running the header/SASL/open/begin
  * handshake and re-attaching links lazily — then retries the
  * interrupted operation once. SASL refusal throws SecurityException
  * and is never retried (failed-SASL-connect restart-with-cause,
  * AMQPReceiver.scala:92).
  */
class Amqp10Endpoint(host: String, port: Int,
    username: Option[String] = None, password: Option[String] = None,
    saslMechanism: String = "PLAIN",
    tls: Option[javax.net.ssl.SSLContext] = None)
    extends AmqpEndpoint with AutoCloseable {

  private var sock: Socket = _
  private var in: DataInputStream = _
  private var out: BufferedOutputStream = _
  private var nextHandle = 0L
  private var nextDeliveryId = 0L
  private var serverPayloadChunk = MaxPayloadChunk
  private val senderLinks = mutable.Map[String, Long]()  // address -> handle
  private var stagingHandle = -1L
  private var coordinatorHandle = -1L
  private val declaredTxns = mutable.Set[String]()
  /** Per address: (delivery-id, seq) of transfers received on THIS
    * connection, both strictly increasing — the settlement ledger. */
  private val received = mutable.Map[String, mutable.ArrayBuffer[(Long, Long)]]()

  // ------------------------------------------------------------ transport
  private def sendFrame(perf: Described, payload: Array[Byte] = Array.emptyByteArray): Unit =
    writeAll(out, encodeFrame(Frame(FrameTypeAmqp, 0, perf, payload)))

  /** Write without flushing — the pipelined produce paths emit hundreds
    * of transfer frames back-to-back, and a flush (= syscall + packet
    * under TCP_NODELAY) per ~70-byte frame was the produce bottleneck
    * (profiled: flushes, not encode, dominate). Callers MUST flush
    * before awaiting any response or the peer never sees the request. */
  private def sendFrameUnflushed(perf: Described, payload: Array[Byte]): Unit =
    out.write(encodeFrame(Frame(FrameTypeAmqp, 0, perf, payload)))

  private def connect(): Unit = {
    sock = tls match {
      case Some(ctx) => ctx.getSocketFactory.createSocket(host, port)
      case None => new Socket(host, port)
    }
    sock.setTcpNoDelay(true)
    in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    out = new BufferedOutputStream(sock.getOutputStream)
    nextHandle = 0L; nextDeliveryId = 0L
    senderLinks.clear(); received.clear(); declaredTxns.clear()
    stagingHandle = -1L; coordinatorHandle = -1L
    if (username.isDefined) {
      writeAll(out, HeaderSasl)
      val serverHeader = readHeader(in)
      require(java.util.Arrays.equals(serverHeader, HeaderSasl), "no SASL layer offered")
      val mechs = readFrame(in) // sasl-mechanisms
      require(descriptorCode(mechs.performative) == Desc.SaslMechanisms)
      if (saslMechanism == Scram.Mechanism) {
        val offered = field(mechs.performative, 0) match {
          case v: Vector[_] => v.collect { case Sym(n) => n }
          case Sym(n) => Vector(n)
          case _ => Vector.empty[String]
        }
        if (!offered.contains(Scram.Mechanism)) {
          close()
          throw new SecurityException(
            s"server does not offer ${Scram.Mechanism} (offered: ${offered.mkString(",")})")
        }
        // RFC 5802: client-first -> challenge (server-first) -> response
        // (client-final with proof) -> outcome (server-final "v=...").
        // The password never rides the wire, and the client REFUSES a
        // server that cannot prove it holds ServerKey (mutual auth).
        val cnonce = Scram.freshNonce()
        val bare = Scram.clientFirstBare(username.getOrElse(""), cnonce)
        writeAll(out, encodeFrame(Frame(FrameTypeSasl, 0,
          described(Desc.SaslInit, Sym(Scram.Mechanism),
            (Scram.Gs2Header + bare).getBytes(UTF_8)), Array.emptyByteArray)))
        val chal = readFrame(in)
        require(descriptorCode(chal.performative) == Desc.SaslChallenge,
          "expected sasl-challenge")
        val sf = new String(field(chal.performative, 0).asInstanceOf[Array[Byte]], UTF_8)
        val attrs = Scram.parseAttrs(sf)
        val combined = attrs.getOrElse("r", "")
        // the server must EXTEND the client nonce (RFC 5802 §5.1 r=):
        // an exact echo would let a replaying peer reuse old transcripts
        if (!combined.startsWith(cnonce) || combined.length <= cnonce.length) {
          close()
          throw new SecurityException("server did not extend the client nonce")
        }
        val salt = Scram.unb64(attrs.getOrElse("s", ""))
        // RFC 5802's client floor: a low iteration count is a downgrade
        // attack (the proof becomes cheap to brute-force offline) —
        // refuse BEFORE computing any proof over the weak parameters
        val iters = attrs.get("i").map(_.toInt).getOrElse {
          close(); throw new SecurityException("sasl-challenge missing iteration count")
        }
        if (iters < 4096) {
          close()
          throw new SecurityException(
            s"server iteration count $iters below the 4096 floor (downgrade?)")
        }
        val withoutProof = Scram.clientFinalWithoutProof(combined)
        val authMsg = Scram.authMessage(bare, sf, withoutProof)
        val salted = Scram.saltedPassword(password.getOrElse(""), salt, iters)
        val clientFinal = withoutProof + ",p=" + Scram.b64(Scram.clientProof(salted, authMsg))
        writeAll(out, encodeFrame(Frame(FrameTypeSasl, 0,
          described(Desc.SaslResponse, clientFinal.getBytes(UTF_8)), Array.emptyByteArray)))
        val outcome = readFrame(in)
        require(descriptorCode(outcome.performative) == Desc.SaslOutcome)
        val authed = field(outcome.performative, 0) match {
          case UByte(0) => true
          case _ => false
        }
        val serverFinal = field(outcome.performative, 1) match {
          case bs: Array[Byte] => new String(bs, UTF_8)
          case _ => ""
        }
        if (!authed) {
          close()
          throw new SecurityException(
            s"AMQP SASL authentication failed for user ${username.getOrElse("<anonymous>")}")
        }
        if (serverFinal != "v=" + Scram.b64(Scram.serverSignature(salted, authMsg))) {
          close()
          throw new SecurityException(
            "SCRAM mutual authentication failed: server signature mismatch")
        }
      } else {
        // RFC 4616 PLAIN initial response: authzid NUL authcid NUL passwd
        val response = ("\u0000" + username.getOrElse("") +
          "\u0000" + password.getOrElse("")).getBytes(UTF_8)
        writeAll(out, encodeFrame(Frame(FrameTypeSasl, 0,
          described(Desc.SaslInit, Sym("PLAIN"), response), Array.emptyByteArray)))
        val outcome = readFrame(in)
        require(descriptorCode(outcome.performative) == Desc.SaslOutcome)
        field(outcome.performative, 0) match {
          case UByte(0) => ()
          case _ =>
            close()
            throw new SecurityException(
              s"AMQP SASL authentication failed for user ${username.getOrElse("<anonymous>")}")
        }
      }
    }
    writeAll(out, HeaderAmqp)
    val serverHeader = readHeader(in)
    require(java.util.Arrays.equals(serverHeader, HeaderAmqp), "bad server AMQP header")
    sendFrame(described(Desc.Open, s"graft-client-${System.identityHashCode(this)}",
      null, UInt(MaxFrameSize.toLong)))
    val serverOpen = await(Desc.Open)
    // §2.7.1: our outgoing frames must fit the SERVER's max-frame-size
    serverPayloadChunk = negotiatedPayloadChunk(field(serverOpen.performative, 2))
    sendFrame(described(Desc.Begin, null, UInt(0L), UInt(65535L), UInt(65535L)))
    await(Desc.Begin)
  }

  /** Read frames until one with the wanted performative arrives; credit
    * flow frames may interleave and are skipped (their grants are
    * informational — the broker's per-transfer disposition is the
    * authoritative admission answer). */
  private def await(code: Long): Frame = {
    var f = readFrame(in)
    while (descriptorCode(f.performative) != code) {
      require(descriptorCode(f.performative) == Desc.Flow,
        f"unexpected performative 0x${descriptorCode(f.performative)}%02x awaiting 0x$code%02x")
      f = readFrame(in)
    }
    f
  }

  private def call[T](op: => T): T = synchronized {
    if (sock == null) connect()
    try op
    catch {
      case e: SecurityException => throw e
      case _: java.io.IOException | _: java.io.EOFException =>
        try sock.close() catch { case _: Throwable => () }
        connect()
        op
    }
  }

  // ---------------------------------------------------------------- links
  private def attachSender(target: Any): Long = {
    val handle = nextHandle
    nextHandle += 1
    sendFrame(described(Desc.Attach, s"graft-snd-$handle", UInt(handle),
      java.lang.Boolean.FALSE, null, null, null, target))
    await(Desc.Attach)
    handle
  }

  private def senderLink(address: String): Long =
    senderLinks.getOrElseUpdate(address,
      attachSender(described(Desc.Target, address)))

  private def stagingLink(): Long = {
    if (stagingHandle < 0)
      stagingHandle = attachSender(described(Desc.Target, StagingTarget))
    stagingHandle
  }

  private def coordinatorLink(): Long = {
    if (coordinatorHandle < 0)
      coordinatorHandle = attachSender(described(Desc.Coordinator))
    coordinatorHandle
  }

  /** Send one transfer's frames (chunked to the negotiated frame size)
    * WITHOUT waiting for its disposition; returns the delivery-id. */
  private def transferFrames(handle: Long, payload: Array[Byte],
      txnId: Option[String]): Long = {
    val did = nextDeliveryId
    nextDeliveryId += 1
    val state = txnId
      .map(t => described(Desc.TransactionalState, t.getBytes(UTF_8)))
      .orNull
    var off = 0
    var done = false
    while (!done) {
      val end = math.min(off + serverPayloadChunk, payload.length)
      val more = end < payload.length
      // unflushed: single-transfer callers flush via transfer(); the
      // pipelined batch paths flush once per batch before draining
      sendFrameUnflushed(described(Desc.Transfer, UInt(handle), UInt(did),
        did.toString.getBytes(UTF_8), UInt(0L), java.lang.Boolean.FALSE,
        java.lang.Boolean.valueOf(more), null, state),
        java.util.Arrays.copyOfRange(payload, off, end))
      off = end
      done = !more
    }
    did
  }

  /** Transfer one message and return the broker's disposition state. */
  private def transfer(handle: Long, payload: Array[Byte],
      txnId: Option[String] = None): Described = {
    transferFrames(handle, payload, txnId)
    out.flush()
    val disp = await(Desc.Disposition)
    field(disp.performative, 4).asInstanceOf[Described]
  }

  // ------------------------------------------------------------ operations
  /** At-least-once under reconnect: [[call]] re-dials and retries the
    * operation once after an IOException, so if the broker applied the
    * transfer but the connection died before the disposition was read,
    * the retry enqueues the message a second time under a new seq (same
    * contract as [[TcpAmqpEndpoint]]). Producers needing exactly-once
    * must use the transactional path ([[stage]]/[[commitStaged]]), whose
    * epoch-idempotent discharge makes replays no-ops. */
  override def send(address: String, msg: AmqpMessage, timestampMicros: Long): Long =
    call {
      val payload = encodeTransferPayload(Seq(TsAnnotation -> timestampMicros), msg)
      val state = transfer(senderLink(address), payload)
      descriptorCode2(state) match {
        case Right(EnqueuedOutcome) => asLong(field(state, 0))
        case Left(Desc.Rejected) => -1L
        case other => throw new IllegalStateException(s"unexpected send outcome: $state")
      }
    }

  /** Pipelined bulk produce: transfers go out back-to-back (many
    * unsettled deliveries in flight — the sender shape link credit and
    * delivery-ids exist for, §2.6.7), then the dispositions are drained
    * and matched by delivery-id. Throughput is bandwidth-bound instead
    * of round-trip-bound: one RTT per BATCH, not per message.
    *
    * The ≤500 in-flight bound is enforced HERE, not by caller
    * convention: the server writes dispositions while we are still
    * writing transfers, and an unbounded batch could fill both socket
    * buffers with neither side reading — the classic pipelining
    * deadlock. Larger inputs are chunked internally; once a chunk sees
    * a credit refusal the remaining messages are refused without
    * touching the wire (credit replenishes only via fetch, never
    * mid-send, so they could not be accepted anyway — the refused
    * SUFFIX contract holds across chunks).
    *
    * Same at-least-once reconnect contract as [[send]], amplified:
    * an IOException mid-chunk replays that whole chunk. */
  override def sendMany(address: String, msgs: Seq[(AmqpMessage, Long)]): Seq[Long] =
    if (msgs.isEmpty) Vector.empty
    else {
      val results = Vector.newBuilder[Long]
      var refused = false
      msgs.grouped(500).foreach { chunk =>
        if (refused) results ++= Vector.fill(chunk.length)(-1L)
        else {
          val rs = sendChunk(address, chunk)
          results ++= rs
          refused = rs.lastOption.contains(-1L)
        }
      }
      results.result()
    }

  private def sendChunk(address: String, msgs: Seq[(AmqpMessage, Long)]): Seq[Long] =
    call {
      val handle = senderLink(address)
      val dids = msgs.map { case (m, ts) =>
        transferFrames(handle, encodeTransferPayload(Seq(TsAnnotation -> ts), m), None)
      }
      out.flush() // the whole chunk in as few packets as the buffer allows
      val outcomes = mutable.Map[Long, Described]()
      while (outcomes.size < dids.size) {
        val disp = await(Desc.Disposition).performative
        val first = asLong(field(disp, 1))
        val last = field(disp, 2) match { case null => first; case v => asLong(v) }
        val state = field(disp, 4).asInstanceOf[Described]
        // record ONLY this chunk's delivery-ids: §2.6.12 lets a broker
        // coalesce ranges or restate earlier deliveries, and counting
        // foreign ids would end the drain early (and a hostile range
        // like [0, 2^32] must not drive a per-id loop)
        dids.foreach(d => if (d >= first && d <= last) outcomes(d) = state)
      }
      dids.map { d =>
        val state = outcomes(d)
        descriptorCode2(state) match {
          case Right(EnqueuedOutcome) => asLong(field(state, 0))
          case Left(Desc.Rejected) => -1L
          case other => throw new IllegalStateException(s"unexpected send outcome: $state")
        }
      }
    }

  /** Descriptor as numeric code (Left) or symbol name (Right). */
  private def descriptorCode2(d: Described): Either[Long, String] = d.descriptor match {
    case ULong(c) => Left(c)
    case UInt(c) => Left(c)
    case Sym(s) => Right(s)
    case other => throw new IllegalArgumentException(s"bad descriptor: $other")
  }

  private def probe(address: String, props: AmqpWireMap): AmqpWireMap = {
    val handle = nextHandle
    nextHandle += 1
    // attach fields (§2.7.3): 0 name, 1 handle, 2 role, 3/4 settle
    // modes, 5 source, 6 target, 7 unsettled, 8 incomplete-unsettled,
    // 9 initial-delivery-count, 10 max-message-size,
    // 11/12 capabilities, 13 properties
    sendFrame(described(Desc.Attach, s"graft-rcv-$handle", UInt(handle),
      java.lang.Boolean.TRUE, null, null,
      described(Desc.Source, address), null, null, null,
      null, null, null, null, props))
    val echo = await(Desc.Attach)
    val echoProps = field(echo.performative, 13) match {
      case m: AmqpWireMap => m
      case _ => AmqpWireMap(Vector.empty)
    }
    sendFrame(described(Desc.Detach, UInt(handle), java.lang.Boolean.TRUE))
    await(Desc.Detach)
    echoProps
  }

  override def latestSeq(address: String): Long = call {
    probe(address, amqpWireMap(Sym(ProbeProp) -> true))
      .get(Sym(LatestProp)).map(asLong).getOrElse(0L)
  }

  override def settledUpTo(address: String): Long = call {
    probe(address, amqpWireMap(Sym(ProbeProp) -> true))
      .get(Sym(SettledProp)).map(asLong).getOrElse(0L)
  }

  /** Timestamp-window probe over the wire (scan predicate pushdown): a
    * probe attach carrying lo/hi; a server without the extension omits
    * the echo props and this returns None — callers fall back to the
    * full replayable window, so talking to an older peer degrades the
    * pruning, never the results. */
  override def timestampWindow(address: String, loMicros: Long,
      hiMicros: Long): Option[(Long, Long)] = call {
    val echo = probe(address, amqpWireMap(Sym(ProbeProp) -> true,
      Sym(TsWinLoProp) -> loMicros, Sym(TsWinHiProp) -> hiMicros))
    for {
      f <- echo.get(Sym(TsWinFromProp)).map(asLong)
      t <- echo.get(Sym(TsWinToProp)).map(asLong)
    } yield (f, t)
  }

  /** Address-discovery probe (pattern subscription): a probe attach on
    * a reserved pseudo-address carrying the glob; the echo's list of
    * matching addresses comes back as a wire list. A server without the
    * extension omits the echo and this returns None — the source then
    * fails the pattern subscription loudly instead of reading nothing. */
  override def listAddresses(pattern: String): Option[Seq[String]] = call {
    probe("graft:discovery", amqpWireMap(Sym(ProbeProp) -> true,
      Sym(AddrPatternProp) -> pattern))
      .get(Sym(AddrListProp)).map {
        case xs: Seq[_] => xs.map(_.toString)
        case other =>
          throw new IllegalStateException(s"bad address-list echo: $other")
      }
  }

  // ------------------------------------ shared subscription (work-sharing)
  // The four claim-ledger RPCs ride probe attaches (request in
  // attach.properties, reply in the echo) — see Amqp10Wire.ShareGroupProp
  // for the framing. A peer without the extension omits the echo prop and
  // the accessor below FAILS LOUDLY: a shared subscription silently
  // degrading to prefix settlement would double-read, exactly the
  // contract of the transport-less default in [[AmqpEndpoint.claim]].
  private def shareEcho(echo: AmqpWireMap, prop: String): Any =
    echo.get(Sym(prop)).getOrElse(throw new UnsupportedOperationException(
      s"this AMQP peer has no shared-subscription claim surface " +
        s"(probe attach echoed no $prop)"))

  private def decodeClaims(v: Any): Seq[AmqpClaim] = v match {
    case xs: Seq[_] => xs.map {
      case c: Seq[_] if c.length == 3 =>
        AmqpClaim(asLong(c(0)), asLong(c(1)), asLong(c(2)))
      case other => throw new IllegalStateException(s"bad share-claim echo: $other")
    }
    case other => throw new IllegalStateException(s"bad share-claim echo: $other")
  }

  /** Same reconnect contract as [[TcpAmqpEndpoint.claim]]: a retried
    * claim whose first reply was lost self-heals via lease expiry
    * (nobody reads the orphan's slices); renew/settle are idempotent
    * broker-side. */
  override def claim(address: String, group: String, owner: String,
      maxRows: Long, leaseMillis: Long): Seq[AmqpClaim] = call {
    decodeClaims(shareEcho(probe(address, amqpWireMap(
      Sym(ShareGroupProp) -> group, Sym(ShareOwnerProp) -> owner,
      Sym(ShareMaxRowsProp) -> maxRows, Sym(ShareLeaseMsProp) -> leaseMillis)),
      ShareClaimsProp))
  }

  override def renewClaims(address: String, group: String, owner: String,
      claims: Seq[AmqpClaim], leaseMillis: Long): Seq[Long] = call {
    val triples: Vector[Any] = claims.toVector.map(c =>
      Vector(c.claimId, c.fromExclusive, c.toInclusive))
    shareEcho(probe(address, amqpWireMap(
      Sym(ShareGroupProp) -> group, Sym(ShareOwnerProp) -> owner,
      Sym(ShareLeaseMsProp) -> leaseMillis, Sym(ShareRenewProp) -> triples)),
      ShareLostProp) match {
      case xs: Seq[_] => xs.map(asLong)
      case other => throw new IllegalStateException(s"bad share-lost echo: $other")
    }
  }

  override def settleClaims(address: String, group: String,
      claimIds: Seq[Long]): Unit = call {
    shareEcho(probe(address, amqpWireMap(
      Sym(ShareGroupProp) -> group,
      Sym(ShareSettleProp) -> (claimIds.toVector: Any))), ShareSettleProp)
    ()
  }

  override def configureGroupPolicy(address: String, group: String,
      maxDeliveries: Int, deadLetterAddress: Option[String]): Unit = call {
    shareEcho(probe(address, amqpWireMap((Vector[(Any, Any)](
      Sym(ShareGroupProp) -> group,
      Sym(SharePolicyMaxProp) -> maxDeliveries.toLong) ++
      deadLetterAddress.map(d => (Sym(SharePolicyDlqProp): Any) -> (d: Any))): _*)),
      SharePolicyMaxProp)
    ()
  }

  override def groupStats(address: String, group: String): AmqpGroupStats = call {
    shareEcho(probe(address, amqpWireMap(
      Sym(ShareGroupProp) -> group, Sym(ShareStatsProp) -> true)),
      ShareStatsEchoProp) match {
      case xs: Seq[_] if xs.length == 5 =>
        AmqpGroupStats(asLong(xs(0)), asLong(xs(1)), asLong(xs(2)),
          asLong(xs(3)), asLong(xs(4)))
      case other => throw new IllegalStateException(s"bad share-stats echo: $other")
    }
  }

  override def fetch(address: String, fromExclusive: Long,
      toInclusive: Long): Seq[(Long, AmqpMessage, Long)] = call {
    if (toInclusive <= fromExclusive) Vector.empty
    else {
      // receiver link resuming at the requested seq (source filter),
      // then one drain-mode flow for exactly the slice's credit
      val handle = nextHandle
      nextHandle += 1
      sendFrame(described(Desc.Attach, s"graft-rcv-$handle", UInt(handle),
        java.lang.Boolean.TRUE, null, null,
        Described(ULong(Desc.Source), Vector(address, null, null, null,
          java.lang.Boolean.FALSE, null, null,
          amqpWireMap(Sym(FromSeqFilter) -> fromExclusive)))))
      await(Desc.Attach)
      sendFrame(described(Desc.Flow, UInt(0L), UInt(65535L), UInt(0L),
        UInt(65535L), UInt(handle), UInt(0L),
        UInt(toInclusive - fromExclusive), UInt(0L), java.lang.Boolean.TRUE))
      val results = Vector.newBuilder[(Long, AmqpMessage, Long)]
      val ledger = received.getOrElseUpdate(address, mutable.ArrayBuffer())
      // reassembly keyed by sending link handle (§2.6.14: multi-frame
      // deliveries may interleave across links; continuations carry the
      // handle but may omit the delivery-id). Single-frame transfers —
      // the overwhelmingly common case — bypass the buffer entirely:
      // this loop decodes the whole drain slice, so a per-message
      // byte-boxing buffer is measurable at 100k messages.
      val chunks = mutable.Map[Long, (Long, java.io.ByteArrayOutputStream)]()
      def complete(did: Long, payload: Array[Byte]): Unit = {
        val (msg, danns) = decodeTransferPayload(payload)
        val seq = danns.collectFirst { case (SeqAnnotation, v) => asLong(v) }
          .getOrElse(throw new IllegalStateException("transfer without seq annotation"))
        val ts = danns.collectFirst { case (TsAnnotation, v) => asLong(v) }.getOrElse(0L)
        results += ((seq, msg, ts))
        if (ledger.isEmpty || ledger.last._2 < seq) ledger += ((did, seq))
      }
      var draining = true
      while (draining) {
        val f = readFrame(in)
        descriptorCode(f.performative) match {
          case Desc.Transfer =>
            val sndHandle = asLong(field(f.performative, 0))
            val more = asBool(field(f.performative, 5))
            chunks.get(sndHandle) match {
              case Some((did, b)) =>
                b.write(f.payload, 0, f.payload.length)
                if (!more) { chunks.remove(sndHandle); complete(did, b.toByteArray) }
              case None =>
                val did = asLong(field(f.performative, 1))
                if (!more) complete(did, f.payload) // fast path: no copy
                else {
                  val b = new java.io.ByteArrayOutputStream(f.payload.length * 2)
                  b.write(f.payload, 0, f.payload.length)
                  chunks(sndHandle) = (did, b)
                }
            }
          case Desc.Flow => draining = false // drain confirmed: slice done
          case other =>
            throw new IllegalStateException(f"unexpected 0x$other%02x during drain")
        }
      }
      sendFrame(described(Desc.Detach, UInt(handle), java.lang.Boolean.TRUE))
      await(Desc.Detach)
      results.result()
    }
  }

  /** Drop the per-connection disposition ledger — called when a pooled
    * partition-reader connection is returned (readers fetch, never
    * settle; without this the ledger grows across every pooled reuse). */
  private[streaming] def forgetDeliveries(): Unit = synchronized { received.clear() }

  override def settle(address: String, upTo: Long): Unit = call {
    // dispositions for the delivery-ids this connection received (the
    // wire-native path); contiguous did runs become one frame each
    val ledger = received.getOrElseUpdate(address, mutable.ArrayBuffer())
    val prefix = ledger.takeWhile(_._2 <= upTo)
    if (prefix.nonEmpty) {
      var runStart = prefix.head._1
      var runEnd = runStart
      def flush(): Unit =
        sendFrame(described(Desc.Disposition, java.lang.Boolean.TRUE,
          UInt(runStart), UInt(runEnd), java.lang.Boolean.TRUE,
          described(Desc.Accepted)))
      prefix.drop(1).foreach { case (did, _) =>
        if (did == runEnd + 1) runEnd = did
        else { flush(); runStart = did; runEnd = did }
      }
      flush()
      ledger.remove(0, prefix.length)
    }
    // restart fallback: seqs delivered on a previous connection have no
    // delivery-id here — an attach-property settle covers the remainder
    if (prefix.isEmpty || prefix.last._2 < upTo)
      probe(address, amqpWireMap(Sym(SettleUpToProp) -> upTo))
    ()
  }

  // ------------------------------------------------------- transactions
  private def declare(txn: String): Unit =
    if (!declaredTxns.contains(txn)) {
      val payload = encodeMessage(AmqpMessage(
        body = AmqpValueBody(described(Desc.Declare, txn))))
      val state = transfer(coordinatorLink(), payload)
      require(descriptorCode2(state) == Left(Desc.Declared),
        s"declare refused: $state")
      declaredTxns += txn
    }

  override def stage(txn: String, partitionId: Int, msgs: Seq[AmqpMessage]): Unit = call {
    declare(txn)
    val handle = stagingLink()
    if (msgs.isEmpty) {
      // an empty stage still REPLACES earlier attempts (task-retry
      // idempotence): a reset-only marker, never staged itself
      val marker = AmqpMessage(messageAnnotations = Seq(
        PartitionAnnotation -> partitionId, PartitionResetAnnotation -> true,
        EmptyStageAnnotation -> true))
      transfer(handle, encodeMessage(marker), Some(txn))
      ()
    } else {
      // PIPELINED staging, same discipline as sendMany: the whole batch
      // of transactional transfers goes out back-to-back, dispositions
      // drained after — one round-trip per ~500-message batch instead
      // of per message (a sink task staging 10k rows was RTT-bound at
      // one disposition await each). The ≤500 bound keeps the socket
      // buffers from deadlocking while both sides write. Task-retry
      // idempotence is unchanged: the FIRST transfer overall carries
      // the partition-reset annotation, so a replayed stage REPLACES
      // the earlier attempt broker-side.
      var overall = 0
      msgs.grouped(500).foreach { group =>
        val dids = group.map { m =>
          val anns = m.messageAnnotations ++
            Seq(PartitionAnnotation -> partitionId) ++
            (if (overall == 0) Seq(PartitionResetAnnotation -> true) else Nil)
          overall += 1
          transferFrames(handle,
            encodeMessage(m.copy(messageAnnotations = anns)), Some(txn))
        }
        out.flush() // the whole batch in as few packets as the buffer allows
        val outcomes = mutable.Map[Long, Described]()
        while (outcomes.size < dids.size) {
          val disp = await(Desc.Disposition).performative
          val first = asLong(field(disp, 1))
          val last = field(disp, 2) match { case null => first; case v => asLong(v) }
          val state = field(disp, 4).asInstanceOf[Described]
          // record only this batch's ids (§2.6.12 range coalescing)
          dids.foreach(d => if (d >= first && d <= last) outcomes(d) = state)
        }
        dids.foreach { d =>
          require(descriptorCode2(outcomes(d)) == Left(Desc.Accepted),
            s"stage refused: ${outcomes(d)}")
        }
      }
    }
  }

  private def discharge(txn: String, fail: Boolean,
      anns: Seq[(String, Any)]): Described = {
    declare(txn)
    val payload = encodeMessage(AmqpMessage(
      messageAnnotations = anns,
      body = AmqpValueBody(described(Desc.Discharge, txn.getBytes(UTF_8),
        java.lang.Boolean.valueOf(fail)))))
    transfer(coordinatorLink(), payload)
  }

  override def commitStaged(txn: String, queryId: String, epochId: Long,
      address: String, timestampMicros: Long, routeByTo: Boolean): Int = call {
    // RouteAnnotation always rides with its REAL boolean value (an
    // explicit false, not absence): the server checks the value, so
    // every non-routed wire commit exercises that check, and the
    // annotation's semantics match the in-memory/TCP transports' boolean
    val state = discharge(txn, fail = false, Seq(
      QueryAnnotation -> queryId, EpochAnnotation -> epochId,
      AddressAnnotation -> address, TsAnnotation -> timestampMicros,
      RouteAnnotation -> routeByTo))
    declaredTxns -= txn
    descriptorCode2(state) match {
      case Right(CommittedOutcome) => asLong(field(state, 0)).toInt
      case other => throw new IllegalStateException(s"commit refused: $state")
    }
  }

  override def abortStaged(txn: String): Unit = call {
    discharge(txn, fail = true, Nil)
    declaredTxns -= txn
    ()
  }

  override def close(): Unit = synchronized {
    if (sock != null) {
      try { sendFrame(described(Desc.Close)); await(Desc.Close) }
      catch { case _: Throwable => () }
      try sock.close() catch { case _: Throwable => () }
    }
  }
}
