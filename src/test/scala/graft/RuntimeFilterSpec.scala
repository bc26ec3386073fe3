package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime Bloom-filter join pruning — the row-group-level sibling of
  * fmt_dpp_join's partition-level pruning: a selective filter on the
  * dim side makes Catalyst inject a `bloom_filter_agg` over the dim's
  * join keys and a `might_contain` probe on the FACT side's scan, so
  * fact rows that cannot join die at the scan instead of crossing the
  * shuffle. At 100 TB this is the difference between shuffling the
  * whole fact table and shuffling the ~join-surviving fraction.
  */
class RuntimeFilterSpec extends AnyFunSuite {

  test("a selective dim filter injects a bloom probe on the fact scan") {
    val base = SparkSpecBase.session
    val s = base.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // scale thresholds to test size: any shuffle-joined side qualifies
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
    val sfDir = "/root/testdata/sf0.001"
    val fact = Tables.lineitem(s, sfDir).select(col("l_orderkey"), col("l_quantity"))
    val dim = Tables.orders(s, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT") // selective
      .select(col("o_orderkey"))
    val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("q"))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("bloom_filter_agg") || optimized.contains("might_contain"),
      s"no runtime bloom filter injected:\n${optimized.take(2000)}")
    // and the filtered plan returns exactly the unfiltered join's answer
    val s2 = base.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val reference = Tables.lineitem(s2, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
      .join(Tables.orders(s2, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("q"))
      .collect().head
    val got = joined.collect().head
    assert(got.getLong(0) == reference.getLong(0) && got.getDouble(1) == reference.getDouble(1))
    assert(got.getLong(0) > 0)
  }
}
