package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftExtensions, SparkSpecBase}

/** Property: for ARBITRARY datasets (duplicate scores, duplicate
  * (score, id) rows, negative/zero/NaN scores, tiny and empty groups)
  * and arbitrary k, the TopKRewrite plan returns exactly the rows the
  * un-rewritten window plan returns. The fixed-fixture spec pins the
  * plan shape; this pins the semantics across the input space —
  * including the NaN-ranks-first and -0.0 == 0.0 comparator edges the
  * aggregate inherits from Spark's sort order. */
class TopKRewritePropertySpec extends AnyFunSuite {

  private lazy val s: SparkSession = {
    SparkSpecBase.session // materialize the shared SparkContext first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val fresh = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
    fresh
  }

  private val genScore: Gen[Double] = Gen.frequency(
    5 -> Gen.chooseNum(-5, 5).map(_.toDouble / 2.0),
    1 -> Gen.const(0.0),
    1 -> Gen.const(-0.0),
    1 -> Gen.const(Double.NaN))

  private val genRows: Gen[List[(Long, Double, Long)]] =
    Gen.listOf(for {
      g <- Gen.chooseNum(0L, 4L)
      sc <- genScore
      id <- Gen.chooseNum(0L, 30L)
    } yield (g, sc, id))

  test("rewritten rows == window rows for arbitrary data and k") {
    val prop = Prop.forAll(genRows, Gen.chooseNum(1, 5)) { (rows, k) =>
      import s.implicits._
      val df = rows.toDF("g", "score", "id")
      val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
      def run(): Set[(Long, Double, Long, Int)] = {
        val out = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        // canonicalize NaN so Set equality is usable
        out.collect().map(r => (r.getLong(0),
          if (r.getDouble(1).isNaN) -999.0 else r.getDouble(1),
          r.getLong(2), r.getInt(3))).toSet
      }
      val rewritten = run()
      s.conf.set("spark.graft.topk.rewrite", "false")
      val reference = try run() finally s.conf.set("spark.graft.topk.rewrite", "true")
      // rows may differ ONLY among ties: identical (score, id) duplicates
      // make row_number's pick among equal rows ambiguous but the emitted
      // values identical — so value-set equality is the exact contract
      rewritten == reference
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("restore shared session") {
    SparkSession.setActiveSession(SparkSpecBase.session)
    SparkSession.setDefaultSession(SparkSpecBase.session)
  }
}
