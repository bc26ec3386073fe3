package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.functions.HashFunctions

class CharFoldHashSpec extends SparkSpecBase {
  import spark.implicits._

  test("native expression equals the HOF formulation on real tokens") {
    val toks = graft.Tables.documents(spark, sfDir)
      .select(explode(split(trim(col("text")), " +")).as("t"))
      .filter(col("t") =!= "")
    CharFoldHash.register(spark)
    val mismatches = toks
      .withColumn("native", expr("char_fold_hash(t)"))
      .withColumn("hof", HashFunctions.charFoldHash(col("t")))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("matches the documented recurrence and handles edge cases") {
    assert(CharFoldHash.hash("the") == 2004401L)
    assert(CharFoldHash.hash("") == 0L)
    assert(CharFoldHash.hash("a") == 97L)
    // supplementary code point folds as one code point
    val cp = new String(Character.toChars(0x1F600))
    assert(CharFoldHash.hash(cp) == 0x1F600L % 2147483647L)
  }

  test("participates in whole-stage codegen") {
    CharFoldHash.register(spark)
    // needs a non-local scan: a local relation is constant-folded away
    val plan = graft.Tables.documents(spark, sfDir)
      .select(expr("char_fold_hash(text)"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a whole-stage-codegen'd operator
    assert(plan.contains("*(1) Project"), plan)
  }
}
