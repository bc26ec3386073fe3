package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Smoke + behavior checks for the text-analysis query surface. Value
  * correctness is enforced by the DuckDB oracle gate; here we assert the
  * queries run, the oracle map is complete, and the BPE merge chain
  * actually composes (multi-rule words collapse to single tokens).
  */
class TextQueriesSpec extends SparkSpecBase {

  for ((name, fn) <- TextQueries.queries) {
    test(s"$name runs and returns rows") {
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("oracle map covers every query") {
    assert(TextQueries.oracleSql.keySet == TextQueries.queries.keySet)
  }

  test("bpe merge chain composes: multi-rule words collapse to one token") {
    val toks = TextQueries.txtBpeVocab(spark, sfDir)
      .select(col("token")).collect().map(_.getString(0)).toSet
    // "scan" needs s c + a n + sc an; "window" needs w in + d ow + win dow;
    // "batch" needs b a + t c + ba tc + batc h — each lands only if the
    // rules applied in priority order, globally, per word.
    for (t <- Seq("scan", "window", "batch", "the"))
      assert(toks.contains(t), s"expected merged token '$t' in vocab: $toks")
    // Unmerged residue must still be single characters / learned pairs,
    // never a raw space-joined word (the splitter ran).
    assert(!toks.exists(_.contains(" ")))
  }

  test("bpe vocab shuffles only vocabulary-sized data (partial agg present)") {
    val plan = TextQueries.txtBpeVocab(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
  }
}
