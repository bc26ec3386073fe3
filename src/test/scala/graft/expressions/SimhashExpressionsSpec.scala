package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.functions.HashFunctions.permute

class SimhashExpressionsSpec extends SparkSpecBase {

  test("simhash_pack equals the inline SWAR column formulation on real hashes") {
    CharFoldHash.register(spark)
    SimhashExpressions.register(spark)
    val nGroups = SimhashExpressions.NGroups
    val inlineLanes = (0 until nGroups).map { g =>
      (0 until 4).flatMap { k =>
        val j = g * 4 + k
        if (j < SimhashExpressions.SimBits)
          Some((permute(col("h"), j) % 2L) * lit(1L << (16 * k)))
        else None
      }.reduce(_ + _).as(s"i$g")
    }
    val vocab = graft.Tables.documents(spark, sfDir)
      .select(explode(split(trim(col("text")), " +")).as("t"))
      .filter(col("t") =!= "").distinct()
      .withColumn("h", expr("char_fold_hash(t)"))
    val mismatches = vocab
      .withColumn("p", expr("simhash_pack(h)"))
      .select((col("p") +: inlineLanes): _*)
      .filter((0 until nGroups)
        .map(g => element_at(col("p"), g + 1) =!= col(s"i$g"))
        .reduce(_ || _))
      .count()
    assert(mismatches == 0)
  }

  test("simhash_sig implements the +/-1 majority vote") {
    // single token, n=1: bit j set iff the token's indicator j is 1
    val h = CharFoldHash.hash("window")
    val lanes = SimhashExpressions.pack(h)
    val sig = SimhashExpressions.sig(lanes, 1L)
    for (j <- 0 until SimhashExpressions.SimBits) {
      val expected = ((h * graft.functions.HashFunctions.permA(j) +
        graft.functions.HashFunctions.permB(j)) % 2147483647L) % 2L
      assert(((sig >> j) & 1L) == expected, s"bit $j")
    }
    // exact tie (ones*2 == n) votes 0, matching `2*ones > n` strictly
    val two = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.fill(SimhashExpressions.NGroups)(0x0001000100010001L))
    assert(SimhashExpressions.sig(two, 2L) == 0L)
    assert(SimhashExpressions.sig(two, 1L) == (1L << SimhashExpressions.SimBits) - 1L)
  }
}
