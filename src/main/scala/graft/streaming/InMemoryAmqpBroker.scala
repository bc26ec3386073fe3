package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.locks.ReentrantLock

import scala.collection.mutable.ArrayBuffer

/** Credit-based flow control, reproducing the reference's live
  * controller (AMQPFlowController.scala:50-142 in /root/reference):
  * manual credit mode (prefetch disabled), an initial grant of
  * [[AmqpFlowController.CreditsDefault]] link credits, one credit
  * consumed per delivery, and a re-issue of the consumed count once
  * consumption crosses [[AmqpFlowController.CreditsThreshold]] (50%).
  * Credits bound the sender's in-flight window; settlement is a separate
  * axis (the reliable path settles only after durable commit).
  */
class AmqpFlowController {
  import AmqpFlowController._

  private var available: Long = CreditsDefault
  private var consumedSinceIssue: Long = 0L
  private var issuedTotal: Long = CreditsDefault

  /** One delivery arrived: consume a credit. Returns false when the
    * sender overran its window (no credit — a compliant peer never
    * does; the in-memory broker turns this into sender back-pressure). */
  def acquire(): Boolean = synchronized {
    if (available <= 0) false
    else {
      available -= 1
      consumedSinceIssue += 1
      if (consumedSinceIssue >= CreditsThreshold) issueCredits()
      true
    }
  }

  /** Re-issue the consumed count (reference issues `count` new credits
    * when count >= threshold, AMQPFlowController.scala:131-141). */
  private def issueCredits(): Unit = {
    available += consumedSinceIssue
    issuedTotal += consumedSinceIssue
    consumedSinceIssue = 0L
  }

  def creditsAvailable: Long = synchronized(available)
  def totalIssued: Long = synchronized(issuedTotal)
}

object AmqpFlowController {
  /** AMQPFlowController.scala:55 (CREDITS_DEFAULT). */
  val CreditsDefault = 1000L
  /** AMQPFlowController.scala:56 — 50% of the window. */
  val CreditsThreshold: Long = CreditsDefault * 50 / 100
}

/** An in-process AMQP-semantics endpoint: addresses hold ordered,
  * sequence-numbered messages; deliveries stay replayable until the
  * consumer settles a prefix (which in the Spark source happens on
  * micro-batch COMMIT — the settle-after-durable-store contract of the
  * reference's reliable receiver, ReliableAMQPReceiver.scala:142-159).
  *
  * Flow control bounds the UNDELIVERED window: senders are refused once
  * `maxInFlight` deliveries are enqueued but not yet fetched by the
  * consumer — matching the reference, whose flow controller re-issues
  * credits as messages are CONSUMED (50% threshold), independent of
  * settlement (AMQPFlowController.scala:131-141; its unsettled buffer is
  * unbounded — SURVEY.md §7.4.2). Settlement gates only redelivery:
  * Spark commits a batch's offsets while constructing the NEXT batch, so
  * settlement intentionally lags one batch (same as the Kafka source's
  * offset commits) — admission must not depend on it or an idle stream
  * would deadlock its producer.
  *
  * This replaces the reference's test fixtures (embedded ActiveMQ broker
  * + Vert.x ProtonServer, AMQPTestUtils.scala:66-91,213-266) in the
  * zero-egress environment: the wire protocol is stubbed, the
  * delivery/settlement/flow-control semantics are real. A TCP transport
  * would implement the same operations against a socket.
  */
class InMemoryAmqpBroker(val maxInFlight: Long = AmqpFlowController.CreditsDefault) {

  /** (seq, message, enqueue timestamp micros). seq starts at 1. */
  private final class Address {
    val lock = new ReentrantLock()
    val messages = new ArrayBuffer[(Long, AmqpMessage, Long)]()
    var nextSeq: Long = 1L
    var settledUpTo: Long = 0L
    var deliveredUpTo: Long = 0L
    val flow = new AmqpFlowController
  }

  private val addresses = new ConcurrentHashMap[String, Address]()

  private def addr(a: String): Address =
    addresses.computeIfAbsent(a, _ => new Address)

  /** Send one message. Returns the assigned sequence number, or -1 when
    * the in-flight window (link credit) is exhausted. */
  def send(address: String, msg: AmqpMessage,
           timestampMicros: Long = System.currentTimeMillis() * 1000L): Long = {
    val q = addr(address)
    q.lock.lock()
    try {
      if (q.nextSeq - 1 - math.max(q.deliveredUpTo, q.settledUpTo) >= maxInFlight) -1L
      else if (!q.flow.acquire()) -1L
      else {
        val seq = q.nextSeq
        q.nextSeq += 1
        q.messages += ((seq, msg, timestampMicros))
        seq
      }
    } finally q.lock.unlock()
  }

  /** Highest sequence number enqueued so far (0 if none). */
  def latestSeq(address: String): Long = {
    val q = addr(address)
    q.lock.lock()
    try q.nextSeq - 1 finally q.lock.unlock()
  }

  /** Deliveries in (fromExclusive, toInclusive]. Advances the delivered
    * watermark (credit consumption) — re-reads of older slices don't
    * move it backwards. */
  def fetch(address: String, fromExclusive: Long, toInclusive: Long): Seq[(Long, AmqpMessage, Long)] = {
    val q = addr(address)
    q.lock.lock()
    try {
      if (toInclusive > q.deliveredUpTo) q.deliveredUpTo = toInclusive
      q.messages.filter { case (s, _, _) => s > fromExclusive && s <= toInclusive }.toSeq
    } finally q.lock.unlock()
  }

  /** Settle (accept + forget) all deliveries with seq <= upTo; frees the
    * unsettled window for senders. Kept messages with seq > upTo remain
    * replayable — the redelivery contract that replaces the WAL. */
  def settle(address: String, upTo: Long): Unit = {
    val q = addr(address)
    q.lock.lock()
    try {
      if (upTo > q.settledUpTo) {
        q.settledUpTo = upTo
        val keep = q.messages.filter { case (s, _, _) => s > upTo }
        q.messages.clear()
        q.messages ++= keep
      }
    } finally q.lock.unlock()
  }

  def settledUpTo(address: String): Long = {
    val q = addr(address)
    q.lock.lock()
    try q.settledUpTo finally q.lock.unlock()
  }

  def unsettledCount(address: String): Long = {
    val q = addr(address)
    q.lock.lock()
    try q.nextSeq - 1 - q.settledUpTo finally q.lock.unlock()
  }

  /** Enqueued but not yet delivered to the consumer (the credit window). */
  def inFlightCount(address: String): Long = {
    val q = addr(address)
    q.lock.lock()
    try q.nextSeq - 1 - math.max(q.deliveredUpTo, q.settledUpTo) finally q.lock.unlock()
  }

  def flowController(address: String): AmqpFlowController = addr(address).flow
}

/** Process-wide endpoint registry: `mem://<name>` endpoints resolve to
  * broker instances reachable from both the driver (offset tracking) and
  * executor threads (partition readers) — in local mode one JVM. A
  * cluster deployment would replace registry lookup with a per-executor
  * TCP connection implementing the same fetch/settle surface.
  */
object AmqpEndpointRegistry {
  private val brokers = new ConcurrentHashMap[String, InMemoryAmqpBroker]()

  def broker(endpoint: String): InMemoryAmqpBroker =
    brokers.computeIfAbsent(endpoint, _ => new InMemoryAmqpBroker())

  def reset(endpoint: String): Unit = brokers.remove(endpoint)
}
