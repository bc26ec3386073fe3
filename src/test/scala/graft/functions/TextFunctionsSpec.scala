package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("v")).collect().head.getAs[T]("v")

  test("tokenCount counts whitespace tokens, blanks are zero") {
    assert(one[Long](tokenCount(col("text")), "the quick  brown fox") == 4L)
    assert(one[Long](tokenCount(col("text")), "   ") == 0L)
    assert(one[Long](tokenCount(col("text")), "") == 0L)
  }

  test("regexTokenCount splits words, digits, marks") {
    // "ab12,cd" -> [ab, 1, 2, ",", cd]
    assert(one[Long](regexTokenCount(col("text")), "ab12,cd") == 5L)
  }

  test("stopwordRatio in [0,1], zero for empty") {
    assert(one[Double](stopwordRatio(col("text")), "the cat") == 0.5)
    assert(one[Double](stopwordRatio(col("text")), "") == 0.0)
  }

  test("qualityScore bounded") {
    for (t <- Seq("", "the", "the quick brown fox jumps over the lazy dog")) {
      val q = one[Double](qualityScore(col("text")), t)
      assert(q >= 0.0 && q <= 1.0, s"quality($t)=$q")
    }
  }

  test("languageId picks marker language, und when nothing hits") {
    assert(one[String](languageId(col("text")), "the cat and the hat") == "en")
    assert(one[String](languageId(col("text")), "el gato que la") == "es")
    assert(one[String](languageId(col("text")), "xyzzy plugh") == "und")
    assert(one[String](languageId(col("text")), "") == "und")
  }

  test("fingerprint is order-sensitive and stable") {
    val a = one[Long](fingerprint(col("text")), "alpha beta gamma")
    val b = one[Long](fingerprint(col("text")), "gamma beta alpha")
    val a2 = one[Long](fingerprint(col("text")), "alpha beta gamma")
    assert(a == a2)
    assert(a != b, "reordering tokens must change the fingerprint")
    assert(one[Long](fingerprint(col("text")), "") == 0L)
  }
}
