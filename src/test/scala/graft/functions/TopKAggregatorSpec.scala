package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the bounded top-k buffer, focused on the
  * degenerate-score regression: a NaN cosine (0/0 from a zero-norm
  * vector) must participate in a TOTAL order — under the pre-fix
  * `>`-based comparator a NaN buffer tail made `better(a, last)` false
  * forever and silently dropped every subsequent real candidate. The
  * contract is Spark/DuckDB sort parity: NaN sorts as greater than
  * every value, so it legitimately occupies a top slot (exactly what
  * `row_number() OVER (ORDER BY cos DESC)` would do); it must never
  * poison the membership of the remaining slots. */
class TopKAggregatorSpec extends AnyFunSuite {

  private def run(k: Int, items: Seq[ScoredId]): Seq[ScoredId] = {
    val agg = new TopKAggregator(k)
    items.foldLeft(agg.zero)(agg.reduce).items
  }

  private def mergeAll(k: Int, parts: Seq[Seq[ScoredId]]): Seq[ScoredId] = {
    val agg = new TopKAggregator(k)
    parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge).items
  }

  test("plain candidates: keeps best k, sorted (cos desc, id asc), order-independent") {
    val xs = Seq(ScoredId(0.1, 1), ScoredId(0.9, 2), ScoredId(0.5, 3),
      ScoredId(0.9, 4), ScoredId(0.3, 5))
    val want = Seq(ScoredId(0.9, 2), ScoredId(0.9, 4), ScoredId(0.5, 3))
    assert(run(3, xs) == want)
    assert(run(3, xs.reverse) == want)
    assert(mergeAll(3, Seq(xs.take(2), xs.drop(2))) == want)
  }

  test("NaN candidate ranks first (NaN-total sort parity) and does not poison the buffer") {
    val nan = ScoredId(Double.NaN, 99)
    val reals = Seq(ScoredId(0.2, 1), ScoredId(0.8, 2), ScoredId(0.6, 3))
    // NaN arriving early: later, better real candidates must still displace
    // weaker reals — the regression dropped them all once NaN was the tail
    val got = run(2, nan +: reals)
    assert(got == Seq(nan, ScoredId(0.8, 2)),
      "NaN holds slot 1; the best REAL candidate must win slot 2")
    // arrival order and partial-merge order do not change the result
    assert(run(2, reals :+ nan) == got)
    assert(mergeAll(2, Seq(Seq(nan, reals.head), reals.tail)) == got)
    assert(mergeAll(2, Seq(reals, Seq(nan))) == got)
  }

  test("all-NaN input: deterministic id tie-break, bounded at k") {
    val xs = Seq(ScoredId(Double.NaN, 3), ScoredId(Double.NaN, 1), ScoredId(Double.NaN, 2))
    val got = run(2, xs)
    assert(got.map(_.vec_id) == Seq(1L, 2L), "NaN == NaN: vec_id asc breaks the tie")
  }

  test("-0.0 and 0.0 compare equal (tie broken by id, matching SQL engines)") {
    val got = run(2, Seq(ScoredId(-0.0, 2), ScoredId(0.0, 1), ScoredId(-0.5, 3)))
    assert(got.map(_.vec_id) == Seq(1L, 2L))
  }

  test("property: any input under any partitioning equals the reference sort") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // reference: full NaN-total sort (cos desc, NaN first, id asc), take k —
    // exactly what row_number() OVER (ORDER BY cos DESC, id ASC) keeps
    def ref(xs: Seq[ScoredId], k: Int): Seq[ScoredId] =
      xs.sortWith { (a, b) =>
        val c = java.lang.Double.compare(
          if (a.cos == 0.0) 0.0 else a.cos, if (b.cos == 0.0) 0.0 else b.cos)
        c > 0 || (c == 0 && a.vec_id < b.vec_id)
      }.take(k)
    val genScore = Gen.frequency(
      (8, Gen.chooseNum(-1.0, 1.0)),
      (1, Gen.oneOf(Double.NaN, 0.0, -0.0, 1.0, -1.0)))
    val genItems = for {
      n   <- Gen.chooseNum(0, 60)
      ids <- Gen.pick(n, 0L until 200L)
      ss  <- Gen.listOfN(n, genScore)
    } yield ids.toSeq.zip(ss).map { case (id, sc) => ScoredId(sc, id) }
    val prop = Prop.forAll(genItems, Gen.chooseNum(1, 8),
        Gen.chooseNum(1, 6)) { (xs, k, nParts) =>
      val parts = if (xs.isEmpty) Seq(Seq.empty[ScoredId])
        else xs.grouped(math.max(1, xs.length / nParts)).toSeq
      mergeAll(k, parts) == ref(xs, k) && run(k, xs) == ref(xs, k)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: native TopKState agrees with the udaf aggregator under any partitioning") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.expressions.TopKState
    // the Catalyst expression's buffer must rank identically to the
    // typed Aggregator it replaced — same NaN-total order, same -0.0
    // folding, same id tie-break, same merge associativity
    def runNative(k: Int, parts: Seq[Seq[ScoredId]]): Seq[ScoredId] = {
      val merged = new TopKState(k)
      parts.foreach { p =>
        val b = new TopKState(k)
        p.foreach(x => b.insert(x.cos, x.vec_id))
        var i = 0
        while (i < b.n) { merged.insert(b.cos(i), b.ids(i)); i += 1 }
      }
      (0 until merged.n).map(i => ScoredId(merged.cos(i), merged.ids(i)))
    }
    def sameAs(a: Seq[ScoredId], b: Seq[ScoredId]): Boolean =
      a.length == b.length && a.zip(b).forall { case (x, y) =>
        x.vec_id == y.vec_id &&
          (x.cos == y.cos || (x.cos.isNaN && y.cos.isNaN))
      }
    val genScore = Gen.frequency(
      (8, Gen.chooseNum(-1.0, 1.0)),
      (1, Gen.oneOf(Double.NaN, 0.0, -0.0, 1.0, -1.0)))
    val genItems = for {
      n   <- Gen.chooseNum(0, 60)
      ids <- Gen.pick(n, 0L until 200L)
      ss  <- Gen.listOfN(n, genScore)
    } yield ids.toSeq.zip(ss).map { case (id, sc) => ScoredId(sc, id) }
    val prop = Prop.forAll(genItems, Gen.chooseNum(1, 8),
        Gen.chooseNum(1, 6)) { (xs, k, nParts) =>
      val parts = if (xs.isEmpty) Seq(Seq.empty[ScoredId])
        else xs.grouped(math.max(1, xs.length / nParts)).toSeq
      sameAs(runNative(k, parts), mergeAll(k, parts))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("native TopKAgg serde round-trips the buffer exactly") {
    import graft.expressions.{TopKAgg, TopKState}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopKAgg(Literal(0.0), Literal(0L), 3)
    val b = new TopKState(3)
    Seq((0.9, 2L), (Double.NaN, 99L), (0.9, 4L), (0.1, 1L))
      .foreach { case (c, i) => b.insert(c, i) }
    val rt = agg.deserialize(agg.serialize(b))
    assert(rt.n == b.n)
    assert((0 until b.n).forall { i =>
      rt.ids(i) == b.ids(i) &&
        (rt.cos(i) == b.cos(i) || (rt.cos(i).isNaN && b.cos(i).isNaN))
    })
  }
}
