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

  test("z-order interleave matches the reference bit math") {
    import org.apache.spark.sql.functions._
    import graft.functions.ZOrder
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 1023L),
      (512L, 7L), (341L, 682L), (1L, 1023L))
    val df = spark.createDataFrame(pairs).toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave(col("x"), col("y"), 10).as("z"))
    df.collect().foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == ZOrder.interleaveRef(x, y, 10), s"($x,$y)")
    }
    // spot anchors: z(1,0)=1 (x takes even bits), z(0,1)=2 (y odd bits),
    // z(1023,1023) = 2^20-1 (full 10-bit grid saturates 20 bits)
    val byXy = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(byXy((1L, 0L)) == 1L && byXy((0L, 1L)) == 2L)
    assert(byXy((1023L, 1023L)) == (1L << 20) - 1)
  }

  test("fmt_zorder_layout gate: buckets tile the grid with tight boxes") {
    import spark.implicits._
    val got = FormatQueries.fmtZorderLayout(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val totalRows = got.map(_._2).sum
    assert(totalRows == graft.Tables.orders(spark, sfDir).count())
    got.foreach { case (zb, _, minGx, maxGx, minGy, maxGy) =>
      assert(minGx >= 0 && maxGx <= 1023 && minGy >= 0 && maxGy <= 1023, s"bucket $zb")
      // a z-range bucket of width 2^10 fixes the top 5 bits of each
      // dimension: its bounding box can span at most 2^5 = 32 grid
      // cells per axis — the tiling property file skipping relies on
      assert(maxGx - minGx < 32, s"bucket $zb gx span ${maxGx - minGx}")
      assert(maxGy - minGy < 32, s"bucket $zb gy span ${maxGy - minGy}")
    }
  }

  test("z-order file layout shrinks per-file bounding boxes in BOTH dimensions") {
    import org.apache.spark.sql.functions._
    import graft.functions.ZOrder
    val grid = FormatQueries.zorderGrid(spark, sfDir)
      .select(col("gx"), col("gy"),
        ZOrder.interleave(col("gx"), col("gy"), 10).as("z"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // 16 range partitions fix the top 4 z bits — two per dimension —
    // so every z file's box spans at most 256 grid cells per axis,
    // while each single-column layout leaves the other axis unclustered
    grid.repartitionByRange(16, col("z")).sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(s"$tmp/byz")
    grid.repartitionByRange(16, col("gx")).sortWithinPartitions(col("gx"))
      .write.mode("overwrite").parquet(s"$tmp/byx")
    grid.repartitionByRange(16, col("gy")).sortWithinPartitions(col("gy"))
      .write.mode("overwrite").parquet(s"$tmp/byy")
    def spans(path: String): (Long, Long) = {
      val rows = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max(col("gx")) - min(col("gx"))).as("sx"),
          (max(col("gy")) - min(col("gy"))).as("sy"))
        .select(sum(col("sx")), sum(col("sy"))).head()
      (rows.getLong(0), rows.getLong(1))
    }
    val (zx, zy) = spans(s"$tmp/byz")
    val (_, xy) = spans(s"$tmp/byx")  // x-sorted: full gy span per file
    val (yx, _) = spans(s"$tmp/byy")  // y-sorted: full gx span per file
    // the z layout must beat EACH single-column layout on the
    // dimension that layout ignores — that's the file-skipping win
    assert(zy * 2 < xy, s"z-layout gy spans $zy not < half of x-layout's $xy")
    assert(zx * 2 < yx, s"z-layout gx spans $zx not < half of y-layout's $yx")
  }
}
