package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property invariants for the credit-based flow controller — the
  * reference's live controller semantics (AMQPFlowController.scala:
  * 50-142 in /root/reference: 1000-credit window, spend-on-send,
  * re-issue consumed count at the 50% threshold) under arbitrary
  * interleavings of sends and consumptions. */
class AmqpFlowControllerPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // an interleaving: positive = try that many sends, negative = consume
  private val genOps: Gen[List[Int]] =
    Gen.listOf(Gen.frequency(
      3 -> Gen.chooseNum(1, 700),
      2 -> Gen.chooseNum(-700, -1)))

  test("invariants hold under any send/consume interleaving") {
    check(Prop.forAll(genOps) { ops =>
      val ctl = new AmqpFlowController
      var accepted = 0L
      var consumed = 0L
      var ok = true
      ops.foreach {
        case n if n > 0 =>
          (1 to n).foreach { _ => if (ctl.trySend()) accepted += 1 }
        case n =>
          // never consume more than has actually been accepted
          val c = math.min(-n.toLong, accepted - consumed)
          if (c > 0) { ctl.consumed(c); consumed += c }
      }
      // 1. credit is never negative
      ok &&= ctl.creditsAvailable >= 0
      // 2. the sender can never run more than the initial window plus
      //    re-issued consumption ahead of the receiver
      ok &&= accepted <= consumed + AmqpFlowController.CreditsDefault
      // 3. issued credit only comes from the initial grant + consumption
      ok &&= ctl.totalIssued <= AmqpFlowController.CreditsDefault + consumed
      // 4. conservation: available = issued - accepted
      ok &&= ctl.creditsAvailable == ctl.totalIssued - accepted
      ok
    })
  }

  test("an idle consumer deadlocks no one but bounds the producer at exactly the window") {
    val ctl = new AmqpFlowController
    var n = 0L
    while (ctl.trySend()) n += 1
    assert(n == AmqpFlowController.CreditsDefault)
    // consumption below the 50% threshold re-issues nothing...
    ctl.consumed(AmqpFlowController.CreditsThreshold - 1)
    assert(!ctl.trySend(), "sub-threshold consumption must not re-issue")
    // ...one more consumed delivery crosses it and re-issues the total
    ctl.consumed(1)
    assert(ctl.creditsAvailable == AmqpFlowController.CreditsThreshold)
  }
}
