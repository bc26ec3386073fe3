package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{SimilarityQueries, TextQueries}

/** Hybrid retrieval demo — the sparse+dense RAG stack at sample scale:
  *
  *   1. SPARSE leg: BM25 keyword ranking over the inverted index
  *      (txt_bm25 — integer fixed-point scoring)
  *   2. DENSE leg: cosine top-k over the embedding column
  *      (sim_topk_bruteforce's shape; swap in sim_topk_ivf / sim_ivf_pq
  *      for the 100 TB index tiers)
  *   3. FUSION: reciprocal rank fusion (sim_hybrid_rrf) — rank-based,
  *      so the legs' incomparable score units never meet
  *   4. (next stage in a full stack: sim_mmr_diversify re-ranks the
  *      fused candidates for diversity before the context window)
  *
  * Each stage is one of the oracle-gated operators; this main just
  * chains them and prints how fusion reorders the legs. Usage:
  *
  *   sbt "runMain graft.examples.HybridRetrieval [sfDir]"
  */
object HybridRetrieval {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("hybrid-retrieval")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // scalastyle:off println
    println(s"corpus: $sfDir")

    println("\n-- sparse leg: BM25 top-5 per keyword query --")
    TextQueries.txtBm25(spark, sfDir)
      .orderBy(col("query_id"), col("rank")).show(25, truncate = false)

    println("-- fused: reciprocal rank fusion of BM25 + dense cosine --")
    val fused = SimilarityQueries.simHybridRrf(spark, sfDir)
    fused.orderBy(col("query_id"), col("rank")).show(25, truncate = false)

    val crossLeg = fused
      .withColumn("legs",
        when(col("srank").isNotNull && col("drank").isNotNull, "both")
          .when(col("srank").isNotNull, "sparse-only").otherwise("dense-only"))
      .groupBy(col("legs")).agg(count(lit(1)).as("n_fused_hits"))
    println("-- where the fused top-5 hits came from --")
    crossLeg.show(false)
    // scalastyle:on println
    spark.stop()
  }
}
