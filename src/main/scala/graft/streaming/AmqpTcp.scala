package graft.streaming

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.util.concurrent.atomic.AtomicBoolean

/** Socket transport for the [[AmqpEndpoint]] surface — the cluster path
  * the in-process registry stands in for under local[n].
  *
  * The reference connects executors to the peer with a Vert.x Proton TCP
  * link (AMQPReceiver.scala:63-88 in /root/reference). This transport
  * keeps that topology — broker in one process, each Spark executor
  * holding its own connection — while framing requests with JDK object
  * streams instead of AMQP 1.0 performatives: the delivery semantics
  * (ordered per-link sequences, credit-gated sends, settle-on-commit
  * replay, transactional staged publish) live in [[AmqpEndpoint]] and
  * are transport-independent; swapping this framing for a Proton codec
  * changes no engine code.
  *
  * Concurrency: the server is thread-per-connection (each executor's
  * reader holds one connection, exactly like one AMQP link per
  * receiver); the client serializes request/response pairs per
  * connection — parallel partitions on one executor each resolve their
  * own client via the registry.
  */
private[streaming] object AmqpTcpProtocol {
  sealed trait Req extends Serializable
  /** SASL-PLAIN parity (AMQPReceiver.scala:70-78 in /root/reference:
    * PLAIN when username/password present, ANONYMOUS otherwise): must be
    * the first request on a credentialed server's connection. */
  case class AuthReq(username: Option[String], password: Option[String]) extends Req
  case class SendReq(address: String, msg: AmqpMessage, tsMicros: Long) extends Req
  /** Bulk produce in one round-trip (the AmqpEndpoint.sendMany
    * pipelining contract); per-message results, refusals as a suffix. */
  case class SendManyReq(address: String, msgs: Seq[(AmqpMessage, Long)]) extends Req
  case class LatestReq(address: String) extends Req
  case class TsWindowReq(address: String, loMicros: Long, hiMicros: Long) extends Req
  case class ListAddrReq(pattern: String) extends Req
  case class FetchReq(address: String, fromExclusive: Long, toInclusive: Long) extends Req
  case class SettleReq(address: String, upTo: Long) extends Req
  case class SettledUpToReq(address: String) extends Req
  // shared subscription (work-sharing) — see AmqpEndpoint.claim
  case class ClaimReq(address: String, group: String, owner: String,
      maxRows: Long, leaseMillis: Long) extends Req
  case class RenewClaimsReq(address: String, group: String, owner: String,
      claims: Seq[AmqpClaim], leaseMillis: Long) extends Req
  case class SettleClaimsReq(address: String, group: String,
      claimIds: Seq[Long]) extends Req
  case class GroupStatsReq(address: String, group: String) extends Req
  case class ConfigureGroupReq(address: String, group: String,
      maxDeliveries: Int, deadLetterAddress: Option[String]) extends Req
  case class StageReq(txn: String, partitionId: Int, msgs: Seq[AmqpMessage]) extends Req
  case class CommitStagedReq(txn: String, queryId: String, epochId: Long,
      address: String, tsMicros: Long, routeByTo: Boolean) extends Req
  case class AbortReq(txn: String) extends Req
}

/** Serves an [[InMemoryAmqpBroker]] over a socket. `port = 0` binds an
  * ephemeral port (see [[port]]). With `credentials` set, every
  * connection must authenticate (AuthReq) before any other operation —
  * wrong or missing credentials close the connection, which surfaces
  * client-side exactly like the reference's failed SASL connect
  * (restart-with-cause, AMQPReceiver.scala:92). */
class AmqpTcpServer(backing: InMemoryAmqpBroker, bindPort: Int = 0,
    credentials: Option[(String, String)] = None) {
  import AmqpTcpProtocol._

  private val server = new ServerSocket()
  server.setReuseAddress(true)
  server.bind(new InetSocketAddress(bindPort))
  private val running = new AtomicBoolean(true)

  def port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val sock = server.accept()
        val t = new Thread(() => serve(sock), s"amqp-tcp-conn-${sock.getPort}")
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable if !running.get() => /* closed */ }
    }
  }, "amqp-tcp-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(sock: Socket): Unit = {
    try {
      sock.setTcpNoDelay(true)
      val out = new ObjectOutputStream(sock.getOutputStream)
      out.flush() // stream header first, before the peer builds its reader
      val in = new ObjectInputStream(sock.getInputStream)
      var authed = credentials.isEmpty
      while (running.get()) {
        val req = in.readObject()
        val resp: Any = req match {
          case AuthReq(u, p) =>
            authed = credentials.forall { case (cu, cp) =>
              u.contains(cu) && p.contains(cp)
            }
            authed
          case _ if !authed =>
            throw new SecurityException("unauthenticated request refused")
          case SendReq(a, m, ts)      => backing.send(a, m, ts)
          case SendManyReq(a, ms)     => backing.sendMany(a, ms)
          case LatestReq(a)           => backing.latestSeq(a)
          case TsWindowReq(a, lo, hi) => backing.timestampWindow(a, lo, hi)
          case ListAddrReq(p)         => backing.listAddresses(p)
          case FetchReq(a, f, t)      => backing.fetch(a, f, t)
          case SettleReq(a, u)        => backing.settle(a, u)
          case SettledUpToReq(a)      => backing.settledUpTo(a)
          case ClaimReq(a, g, o, n, l)        => backing.claim(a, g, o, n, l)
          case RenewClaimsReq(a, g, o, cs, l) => backing.renewClaims(a, g, o, cs, l)
          case SettleClaimsReq(a, g, ids)     => backing.settleClaims(a, g, ids)
          case GroupStatsReq(a, g)            => backing.groupStats(a, g)
          case ConfigureGroupReq(a, g, n, dl) => backing.configureGroupPolicy(a, g, n, dl)
          case StageReq(x, p, ms)     => backing.stage(x, p, ms)
          case CommitStagedReq(x, q, e, a, ts, rt) => backing.commitStaged(x, q, e, a, ts, rt)
          case AbortReq(x)            => backing.abortStaged(x)
        }
        out.writeObject(resp)
        out.flush()
        out.reset() // don't let the object cache pin every message ever sent
        if (!authed && credentials.isDefined)
          throw new SecurityException("authentication failed — closing")
      }
    } catch { case _: Throwable => /* peer closed */ }
    finally sock.close()
  }

  def close(): Unit = {
    running.set(false)
    server.close()
  }
}

/** Client side: an [[AmqpEndpoint]] whose every operation is one
  * request/response round-trip to an [[AmqpTcpServer]]. Authenticates
  * on first use (SASL-PLAIN parity: credentials if given, anonymous
  * otherwise — an anonymous server accepts both).
  *
  * Disconnect parity: the reference restarts its receiver when the TCP
  * connection drops or the peer closes (AMQPReceiver.scala:124-142 in
  * /root/reference — `restart("Connection ... closed/disconnected")`).
  * Here the link re-dials and re-authenticates on IO failure, then
  * retries the interrupted operation once. The retry preserves the
  * reference's at-least-once contract: reads (fetch/latest/settled) are
  * idempotent, settlement is a monotone prefix, staged-commit is
  * epoch-idempotent on the broker — and a send whose ack was lost may
  * duplicate, exactly the redelivery the reference accepts between
  * store and settle. */
class TcpAmqpEndpoint(host: String, port: Int,
    username: Option[String] = None, password: Option[String] = None)
    extends AmqpEndpoint with AutoCloseable {
  import AmqpTcpProtocol._

  private var sock: Socket = _
  private var out: ObjectOutputStream = _
  private var in: ObjectInputStream = _

  private def rawCall[T](req: Req): T = {
    out.writeObject(req)
    out.flush()
    out.reset()
    in.readObject().asInstanceOf[T]
  }

  /** (Re)dial + SASL handshake. Auth refusal throws SecurityException
    * and is never retried (failed-SASL-connect parity). */
  private def connect(): Unit = {
    sock = new Socket(host, port)
    sock.setTcpNoDelay(true)
    out = new ObjectOutputStream(sock.getOutputStream)
    out.flush() // stream header first, before the peer builds its reader
    in = new ObjectInputStream(sock.getInputStream)
    if (!rawCall[Boolean](AuthReq(username, password)))
      throw new SecurityException(
        s"AMQP authentication failed for user ${username.getOrElse("<anonymous>")}")
  }

  private def call[T](req: Req): T = synchronized {
    if (sock == null) connect()
    try rawCall(req)
    catch { case _: java.io.IOException =>
      try sock.close() catch { case _: Throwable => () }
      connect()
      rawCall(req)
    }
  }

  override def send(address: String, msg: AmqpMessage, timestampMicros: Long): Long =
    call[Long](SendReq(address, msg, timestampMicros))
  override def sendMany(address: String, msgs: Seq[(AmqpMessage, Long)]): Seq[Long] =
    if (msgs.isEmpty) Vector.empty
    else call[Seq[Long]](SendManyReq(address, msgs))
  override def latestSeq(address: String): Long = call[Long](LatestReq(address))
  override def timestampWindow(address: String, loMicros: Long,
      hiMicros: Long): Option[(Long, Long)] =
    call[Option[(Long, Long)]](TsWindowReq(address, loMicros, hiMicros))
  override def listAddresses(pattern: String): Option[Seq[String]] =
    call[Option[Seq[String]]](ListAddrReq(pattern))
  override def fetch(address: String, fromExclusive: Long, toInclusive: Long): Seq[(Long, AmqpMessage, Long)] =
    call[Seq[(Long, AmqpMessage, Long)]](FetchReq(address, fromExclusive, toInclusive))
  override def settle(address: String, upTo: Long): Unit =
    call[Any](SettleReq(address, upTo))
  override def settledUpTo(address: String): Long = call[Long](SettledUpToReq(address))
  // a retried claim whose first reply was lost self-heals via lease
  // expiry (nobody read the orphan's slices); renew/settle are idempotent
  override def claim(address: String, group: String, owner: String,
      maxRows: Long, leaseMillis: Long): Seq[AmqpClaim] =
    call[Seq[AmqpClaim]](ClaimReq(address, group, owner, maxRows, leaseMillis))
  override def renewClaims(address: String, group: String, owner: String,
      claims: Seq[AmqpClaim], leaseMillis: Long): Seq[Long] =
    call[Seq[Long]](RenewClaimsReq(address, group, owner, claims, leaseMillis))
  override def settleClaims(address: String, group: String, claimIds: Seq[Long]): Unit =
    call[Any](SettleClaimsReq(address, group, claimIds))
  override def groupStats(address: String, group: String): AmqpGroupStats =
    call[AmqpGroupStats](GroupStatsReq(address, group))
  override def configureGroupPolicy(address: String, group: String,
      maxDeliveries: Int, deadLetterAddress: Option[String]): Unit =
    call[Any](ConfigureGroupReq(address, group, maxDeliveries, deadLetterAddress))
  override def stage(txn: String, partitionId: Int, msgs: Seq[AmqpMessage]): Unit =
    call[Any](StageReq(txn, partitionId, msgs))
  override def commitStaged(txn: String, queryId: String, epochId: Long, address: String,
      timestampMicros: Long, routeByTo: Boolean): Int =
    call[Int](CommitStagedReq(txn, queryId, epochId, address, timestampMicros, routeByTo))
  override def abortStaged(txn: String): Unit = call[Any](AbortReq(txn))

  override def close(): Unit = synchronized {
    if (sock != null) { try sock.close() catch { case _: Throwable => () } }
  }
}
