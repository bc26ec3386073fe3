package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftExtensions, SparkSpecBase}

/** The optimizer rule must turn the declarative rank-filter window
  * top-k into the bounded TopKAgg aggregate — same rows, no Window
  * operator, no sort — and must stay OUT whenever its guard conditions
  * do not hold.
  */
class TopKRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val base = SparkSpecBase.session

  private lazy val s: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val fresh = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
    assert(fresh ne base)
    fresh
  }

  override def afterAll(): Unit = {
    SparkSession.setActiveSession(base)
    SparkSession.setDefaultSession(base)
  }

  private def data: DataFrame = {
    import s.implicits._
    // several groups, enough rows per group, deterministic scores with
    // score ties inside groups (tie-break on id must decide)
    (0L until 400L).map { i =>
      (i % 7, ((i * 37) % 50).toDouble / 10.0, i)
    }.toDF("g", "score", "id")
  }

  private def windowTopK(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  test("rewrite fires: no Window operator, ObjectHashAggregate instead") {
    val df = windowTopK(data, 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("topk_agg"), plan)
  }

  test("rewritten result equals the window semantics exactly (rows, rn, ties)") {
    import s.implicits._
    val got = windowTopK(data, 3)
      .as[(Long, Double, Long, Int)].collect().toSet
    // ground truth computed driver-side from the same data
    val expected = data.as[(Long, Double, Long)].collect()
      .groupBy(_._1)
      .flatMap { case (g, rows) =>
        rows.sortBy(r => (-r._2, r._3)).take(3).zipWithIndex
          .map { case ((gg, sc, id), i) => (gg, sc, id, i + 1) }.toSeq
      }.toSet
    assert(got == expected)
  }

  test("rn = 1 (argmax) form rewrites too") {
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    val df = data.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(df.count() == 7)
  }

  test("guard: a payload column the aggregate would lose blocks the rewrite") {
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    val df = data.withColumn("payload", col("id") * 2)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    // payload is referenced downstream, so pruning cannot remove it and
    // the rule must leave the Window plan alone
    val out = df.select("g", "payload", "rn")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
  }

  test("guard: ascending score order blocks the rewrite") {
    val w = Window.partitionBy(col("g")).orderBy(col("score").asc, col("id").asc)
    val df = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
  }

  test("guard: missing tie-break column blocks the rewrite") {
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc)
    val df = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
  }

  test("kill switch: spark.graft.topk.rewrite=false restores the window plan") {
    s.conf.set("spark.graft.topk.rewrite", "false")
    try {
      val plan = windowTopK(data, 3).queryExecution.executedPlan.toString
      assert(plan.contains("Window"), plan)
    } finally s.conf.set("spark.graft.topk.rewrite", "true")
  }

  test("q66_auto_topk rewrites on real data and matches the un-rewritten rows") {
    val sfDir = "/root/testdata/sf0.001"
    val df = graft.operators.RelationalQueries.q66AutoTopK(s, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("topk_agg"), plan)
    val got = df.collect().map(r =>
      (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    s.conf.set("spark.graft.topk.rewrite", "false")
    val reference = try {
      graft.operators.RelationalQueries.q66AutoTopK(s, sfDir).collect().map(r =>
        (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    } finally s.conf.set("spark.graft.topk.rewrite", "true")
    assert(got == reference, "rewritten rows diverge from the window plan's")
    assert(got.nonEmpty)
  }

  test("rank() / dense_rank() are NOT rewritten (different tie semantics)") {
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    val df = data.withColumn("rn", rank().over(w)).filter(col("rn") <= 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
  }
}
