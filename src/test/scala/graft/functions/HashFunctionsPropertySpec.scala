package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.expressions.CharFoldHash

/** Property tests for the portable hashing/shingling primitives that a
  * dozen oracle-gated queries build on. These pin the INVARIANTS the
  * dedup algebra needs (permutation bijectivity for MinHash, shingle
  * counting, three-way hash agreement) rather than specific values.
  */
class HashFunctionsPropertySpec extends SparkSpecBase {

  private def check(prop: Prop, n: Int = 500): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val P = HashFunctions.P

  test("permute is a bijection of [0,P) for every band index (MinHash soundness)") {
    // permA(i) != 0 mod prime P makes h -> h*a+b mod P invertible; a
    // collision would silently corrupt MinHash signatures. Also pins
    // range membership.
    val genH = Gen.chooseNum(0L, P - 1)
    val genI = Gen.chooseNum(0, 63)
    def permuteScala(h: Long, i: Int): Long =
      (h * HashFunctions.permA(i) + HashFunctions.permB(i)) % P
    check(Prop.forAll(genH, genH, genI) { (h1, h2, i) =>
      val (p1, p2) = (permuteScala(h1, i), permuteScala(h2, i))
      p1 >= 0 && p1 < P && ((h1 == h2) == (p1 == p2))
    })
  }

  test("charFoldHash: native expression, HOF column, and Scala agree (3-way, generated strings)") {
    val genStr: Gen[String] = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '.', ',', '!', '"', '\\'),
      1 -> Gen.oneOf('é', 'λ', '中'))).map(_.mkString)
    val strs = Gen.listOfN(300, genStr).sample.getOrElse(Nil)
    assert(strs.nonEmpty)
    CharFoldHash.register(spark)
    import spark.implicits._
    val rows = strs.toDF("t")
      .withColumn("native", expr("char_fold_hash(t)"))
      .withColumn("hof", HashFunctions.charFoldHash(col("t")))
      .collect()
    rows.foreach { r =>
      val expected = CharFoldHash.hash(r.getString(0))
      assert(r.getLong(1) == expected && r.getLong(2) == expected,
        s"hash divergence on ${r.getString(0)}")
    }
  }

  test("native word_shingle_set equals the HOF shingle set on adversarial spacing") {
    graft.expressions.ShingleExpressions.register(spark)
    val genText: Gen[String] = Gen.listOf(Gen.frequency(
      5 -> Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString),
      3 -> Gen.const(" "),
      1 -> Gen.const("   "),
      1 -> Gen.const("\ttabbed"))).map(_.mkString(" "))
    val texts = Gen.listOfN(200, genText).sample.getOrElse(Nil) ++
      Seq("", " ", "a", "a b", "  a  b  c  ", "a a a a")
    import spark.implicits._
    for (n <- Seq(2, 3, 4)) {
      val rows = texts.toDF("text")
        .select(col("text"),
          expr(s"word_shingle_set(text, $n)").as("native"),
          HashFunctions.shingleSet(col("text"), n).as("hof"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n diverged on '${r.getString(0)}'")
      }
    }
  }

  test("shingles: count, width, and content follow from the token stream") {
    val genTokens = Gen.listOf(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))
    val genN = Gen.chooseNum(2, 5)
    val cases = Gen.listOfN(120, Gen.zip(genTokens, genN)).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    import spark.implicits._
    cases.groupBy(_._2).foreach { case (n, group) =>
      val texts = group.map(_._1.mkString(" "))
      val rows = texts.toDF("text")
        .select(col("text"), HashFunctions.shingles(col("text"), n).as("sh"))
        .collect()
      rows.foreach { r =>
        val toks = r.getString(0).split(" +").filter(_.nonEmpty).toSeq
        val sh = r.getSeq[String](1)
        assert(sh.length == math.max(0, toks.length - n + 1),
          s"count for n=$n over $toks")
        assert(sh == toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq,
          s"content for n=$n over $toks")
      }
    }
  }
}
