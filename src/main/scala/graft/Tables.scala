package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). Every operator query in [[SparkEntry]]
  * reads through here so that column pruning / filter pushdown reach the
  * parquet scan uniformly.
  *
  * At cluster scale these would be catalog tables (ideally bucketed on
  * their join keys); the loaders keep the access path declarative so
  * Catalyst's pushdown works the same either way.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `events.parquet` has shipped `ts` in two encodings across driver
    * testdata generations: parquet TIMESTAMP(NANOS) (readable only as a
    * raw long via spark.sql.legacy.parquet.nanosAsLong) and plain µs
    * TIMESTAMP (surfaced as TIMESTAMP_NTZ). Both are normalized to the
    * same two columns every query reads: `ts_ns` (exact int64 nanos —
    * they do not fit a double, so bucketing math stays integral) and
    * `ts` (a proper µs TimestampType instant; NTZ→instant is exact
    * under the UTC session timezone all entry points pin).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    val normalized = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) generation
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ => // µs generation (NTZ or instant)
        raw.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
    // Canonical column order, identical regardless of which testdata
    // generation produced the file — positional consumers (select *,
    // parquet dumps compared positionally) must not depend on the branch.
    val others = normalized.columns.filterNot(c => c == "ts" || c == "ts_ns")
    normalized.select((others :+ "ts" :+ "ts_ns").map(col): _*)
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
