package graft.operators

import graft.SparkSpecBase

class FormatQueriesSpec extends SparkSpecBase {
  import spark.implicits._

  private def direct = {
    // the same gate aggregate computed straight from parquet
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    graft.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_orderkey")).as("sum_okey"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"),
        // parquet stores NTZ; hop through TimestampType (UTC session)
        max(col("l_shipdate")).cast(TimestampType).cast(LongType).as("max_ship_s"))
      .as[(String, Long, Long, Double, Long)].collect().toSet
  }

  test("csv round-trip preserves the gate aggregate bit-for-bit") {
    val got = FormatQueries.fmtCsvRoundtrip(spark, sfDir)
      .as[(String, Long, Long, Double, Long)].collect().toSet
    assert(got == direct, "CSV round-trip corrupted values")
    assert(got.nonEmpty)
  }

  test("json round-trip preserves the gate aggregate bit-for-bit") {
    val got = FormatQueries.fmtJsonRoundtrip(spark, sfDir)
      .as[(String, Long, Long, Double, Long)].collect().toSet
    assert(got == direct, "JSON round-trip corrupted values")
    assert(got.nonEmpty)
  }

  test("partitioned layout: filter is answered by partition pruning") {
    val df = FormatQueries.fmtPartitionPrune(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the returnflag predicate must sit in PartitionFilters (directory
    // pruning), not as a row-level data filter over all partitions
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
    val got = df.as[(String, Long, Long, Double, Long)].collect().toSet
    assert(got == direct.filter(_._1 == "R"),
      "partition-pruned aggregate diverged from the direct scan")
  }

  test("dpp join: fact partitions are pruned at runtime by the dim filter") {
    val df = FormatQueries.fmtDppJoin(spark, sfDir)
    // the pruning predicate cannot be static (it lives on the dim's
    // weight column) — Catalyst must plant a dynamicpruning subquery
    // on the fact scan
    val planned = df.queryExecution.executedPlan.toString
    assert(planned.contains("dynamicpruning"), planned)
    import spark.implicits._
    val got = df.as[(String, Long, Double, Long)].collect()
    // 'view' (length 4) is the one dim row the filter drops: its fact
    // partition must vanish from the output, the other four survive
    assert(got.map(_._1).toSet ==
      Set("click", "error", "signup", "purchase"), got.mkString(","))
  }

  test("bucketed join is co-located: no shuffle on either join side") {
    val df = FormatQueries.fmtBucketJoin(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    // bucket layout replaces the exchange: neither join key may be
    // re-shuffled (the only allowed Exchange is the final tiny
    // aggregation on o_orderpriority)
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
    assert(plan.contains("Bucketed: true"), plan)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val got = df.as[(String, Long, Double)].collect().toSet
    val expected = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == expected, "bucket-routed join diverged from the direct join")
  }

  test("fmt_schema_merge: old-generation rows surface the evolved column as NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = FormatQueries.fmtSchemaMerge(spark, sfDir)
      .as[(String, Long, Double, Long, Long)].collect()
    assert(got.nonEmpty)
    val cut = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val byFlag = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        (col("l_shipdate") >= lit(cut)).as("evolved"))
      .as[(String, Boolean)].collect()
      .groupBy(_._1).map { case (f, g) => f -> (g.length.toLong, g.count(_._2).toLong) }
    got.foreach { case (flag, nRows, _, nEvolved, _) =>
      val (total, newGen) = byFlag(flag)
      assert(nRows == total, s"$flag: merged read lost rows")
      assert(nEvolved == newGen,
        s"$flag: evolved-column count must equal new-generation rows only")
      assert(nEvolved < nRows, s"$flag: old generation must contribute NULLs")
    }
  }
}
