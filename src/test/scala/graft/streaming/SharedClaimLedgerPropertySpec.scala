package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property invariants for the shared-subscription claim ledger under
  * arbitrary interleavings of claims (by several owners), settles,
  * renews, and lease expiries (driven by an injected clock). The
  * exactly-once contract of the whole feature reduces to these:
  *
  *  1. NO DOUBLE LEASE — at every step, live claims' slices are
  *     pairwise disjoint (a row is leased to at most one owner);
  *  2. NO RESURRECTION — a settled row is never leased again (settled
  *     ranges never overlap anything later claimed);
  *  3. CONSERVATION — settled + leased + redeliverable + undispatched
  *     rows exactly tile (initialFloor, head];
  *  4. BOUNDS — every claimed slice lies within (initialFloor, head].
  */
class SharedClaimLedgerPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // op encoding: (kind, arg) — kind 0 claim-by-owner(arg%3), 1 settle a
  // random live claim, 2 advance the clock (arg ms), 3 renew a random
  // live claim's owner view, 4 send arg more messages
  private val genOps: Gen[List[(Int, Int)]] =
    Gen.listOfN(60, Gen.zip(Gen.chooseNum(0, 4), Gen.chooseNum(1, 40)))

  test("claim ledger invariants hold under any claim/settle/renew/expiry interleaving") {
    check(Prop.forAll(genOps) { ops =>
      val b = new InMemoryAmqpBroker
      var now = 1000L
      b.clockMillis = () => now
      (1 to 50).foreach(i => b.send("q", AmqpMessage(body = AmqpValueBody(i.toString))))
      var head = 50L
      val owners = Array("A", "B", "C")
      // (owner, claim) with live == what WE believe is unsettled; the
      // broker may expire any of them — invariants must hold regardless
      var issued = Vector.empty[(String, AmqpClaim)]
      var settled = Vector.empty[AmqpClaim]
      var ok = true
      def liveRanges: Seq[(Long, Long)] = {
        // ground truth from the broker: renew each issued claim under
        // its owner with zero extension intent; the ones NOT lost are
        // live (rescued-if-expired is fine — that is renew's contract)
        issued.groupBy(_._1).toSeq.flatMap { case (o, cs) =>
          val lost = b.renewClaims("q", "g", o, cs.map(_._2), 60000).toSet
          cs.collect { case (_, c) if !lost.contains(c.claimId) =>
            (c.fromExclusive, c.toInclusive) }
        }
      }
      ops.foreach {
        case (0, a) =>
          val got = b.claim("q", "g", owners(a % 3), a.toLong, leaseMillis = 100)
          // 4. bounds
          ok &&= got.forall(c => c.fromExclusive >= 0 && c.toInclusive <= head)
          // 2. no resurrection: never overlaps anything settled
          ok &&= got.forall(c => settled.forall(s =>
            c.toInclusive <= s.fromExclusive || c.fromExclusive >= s.toInclusive))
          issued ++= got.map(owners(a % 3) -> _)
        case (1, a) if issued.nonEmpty =>
          val (o, c) = issued(a % issued.length)
          // a consumer settles only claims it still OWNS (renew first —
          // exactly what the stream's planInputPartitions does); a stale
          // handle whose slice was re-dispatched is dropped, because its
          // rows belong to (and will be settled under) the new claim
          if (b.renewClaims("q", "g", o, Seq(c), 60000).isEmpty) {
            b.settleClaims("q", "g", Seq(c.claimId))
            settled :+= c
          }
          issued = issued.filterNot(_._2.claimId == c.claimId)
        case (2, a) => now += a * 10L
        case (3, a) if issued.nonEmpty =>
          val (o, c) = issued(a % issued.length)
          b.renewClaims("q", "g", o, Seq(c), 100)
          ()
        case (4, a) =>
          (1 to a).foreach(i => b.send("q", AmqpMessage(body = AmqpValueBody(s"x$i"))))
          head += a
        case _ => ()
      }
      // 1. no double lease: live slices pairwise disjoint
      val live = liveRanges.sortBy(_._1)
      ok &&= live.sliding(2).forall {
        case Seq((_, t1), (f2, _)) => t1 <= f2
        case _ => true
      }
      // 3. conservation: one atomic snapshot tiles the whole span
      val st = b.groupStats("q", "g")
      val settledRows = settled.map(c => c.toInclusive - c.fromExclusive).sum
      ok &&= st.headSeq == head
      ok &&= (st.headSeq - st.dispatchedUpTo) + st.outstandingRows +
        st.redeliverableRows + settledRows == head
      // 2b. and the settled rows are REALLY gone while everything else
      // is still fetchable (count surviving messages)
      ok &&= b.fetch("q", 0, head).length.toLong == head - settledRows
      ok
    }, n = 120)
  }
}
