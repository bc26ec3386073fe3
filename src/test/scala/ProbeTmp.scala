object ProbeTmp {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val q = mem.toDF().toDF("ts", "tag")
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("tag"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long").as("ws"), col("tag"), col("n"))
      .writeStream.format("memory").queryName("probe").outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: max ts 12:00:00 exactly → wm becomes 10:00:00 exactly
    mem.addData((t("2024-01-01 05:30:00"), "b1-0530"), (t("2024-01-01 12:00:00"), "b1-anchor"))
    q.processAllAvailable()
    println("[probe] after b1: " + spark.table("probe").collect().sortBy(_.getLong(0)).mkString(" | "))
    // wm now 10:00. batch 2 probes:
    //  - 09:30 → window [09,10) end 10:00 == wm  → drop iff boundary <=
    //  - 10:30 → window [10,11) end 11:00 > wm   → kept
    mem.addData((t("2024-01-01 09:30:00"), "b2-0930-endEQwm"), (t("2024-01-01 10:30:00"), "b2-1030"))
    q.processAllAvailable()
    println("[probe] after b2: " + spark.table("probe").collect().sortBy(_.getLong(0)).mkString(" | "))
    // emit boundary: windows with end == wm — were [09,10) rows from b1 emitted once wm hit 10:00?
    // b1 05:30 row: window end 06:30 < 10:00 → emitted in b2 (after wm advanced)
    // add batch 3 advancing wm to 12:00 → window [11,12) end==12:00 boundary emit test needs a row there first
    mem.addData((t("2024-01-01 11:30:00"), "b3-1130"), (t("2024-01-01 14:00:00"), "b3-anchor"))
    q.processAllAvailable()  // wm → 12:00 after this batch; emission visible NEXT batch
    mem.addData((t("2024-01-01 15:00:00"), "b4-tick"))
    q.processAllAvailable()
    println("[probe] after b4: " + spark.table("probe").collect().sortBy(_.getLong(0)).mkString(" | "))
    q.stop()
  }
}
