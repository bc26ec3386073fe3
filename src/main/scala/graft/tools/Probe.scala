package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.DedupQueries
/** Scratch perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val c = f
      println(s"PROBE $n: ${(System.nanoTime - t0) / 1e9}s rows=$c")
    }
    time("embedding")(DedupQueries.dedupEmbeddingCosine(spark, d).count())
    time("exact")(DedupQueries.dedupExact(spark, d).count())
    time("minhash")(DedupQueries.dedupMinhashLsh(spark, d).count())
    spark.stop()
  }
}
