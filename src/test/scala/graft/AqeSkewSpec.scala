package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE's runtime skew-join split, demonstrated live: q24 handles skew
  * by SALTING (a plan-time fix the query author writes); this suite
  * proves the engine-side fallback — Spark's adaptive skew-join — fires
  * on a join this repo's thresholds would meet at scale. A hot key
  * owning ~half the probe side lands in one shuffle partition; with
  * AQE skew handling on (and thresholds scaled down to test size), the
  * FINAL adaptive plan must mark the sort-merge join `skew=true` —
  * the runtime re-plan that saves the straggler task at 100 TB.
  */
class AqeSkewSpec extends AnyFunSuite {

  test("adaptive skew join splits the hot key's partition (skew=true in the final plan)") {
    val base = SparkSpecBase.session
    val s = base.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // scale the skew thresholds down to test-sized partitions: a
    // partition is "skewed" past 2x the median AND 64KB
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._

    // probe side: key 0 owns 200k rows (plus a payload so bytes count),
    // the rest spread over 10k keys
    val left = s.range(0, 220000)
      .select(when(col("id") < 200000, 0L).otherwise(col("id") % 10000).as("k"),
        concat(lit("payload-"), col("id")).as("pay"))
    val right = s.range(0, 10000).select(col("id").as("k"), (col("id") * 2).as("v"))
    // NOTE: no keyed aggregate downstream — a groupBy(k) would REUSE the
    // join's hash partitioning, and OptimizeSkewedJoin refuses any split
    // that breaks a partitioning a parent still needs. The global
    // aggregate has no required distribution, so the split is legal.
    val joined = left.join(right, Seq("k"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("k") === 0, 1L).otherwise(0L)).as("hot_rows"),
        // reference the payload so column pruning keeps the hot
        // partition's bytes above the skew threshold
        sum(length(col("pay"))).as("pay_bytes"))

    // collect() executes THIS queryExecution (head() would spawn a
    // separate limit plan and leave this one unfinalized)
    val row = joined.collect().head
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"AQE did not split the skewed partition:\n${finalPlan.take(2000)}")

    // and the result is still exact after the split
    assert(row.getLong(0) == 220000L, s"join lost rows: ${row.getLong(0)}")
    // 200000 hot-range rows + ids 200000/210000 (≡ 0 mod 10000)
    assert(row.getLong(1) == 200002L, s"hot key lost rows: ${row.getLong(1)}")
  }
}
