package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{DedupQueries, TextQueries}

/** End-to-end training-data pipeline demo over the `documents` table —
  * the stages a 100 TB corpus run chains, at sample scale:
  *
  *   1. blocklist + too-short filtering (corpus_blocklist disposition)
  *   2. quality scoring (txt_quality)
  *   3. exact dedup (dedup_exact) then near-dup clustering
  *      (dedup_cluster) — keep one doc per cluster
  *   4. deterministic train/val/test split (split_stratified logic)
  *   5. temperature-scaled source rebalance (corpus_mix_temperature)
  *   6. deterministic training-order shuffle (corpus_shuffle_shards)
  *
  * Each stage is one of the oracle-gated operators; this main just
  * chains them and prints the funnel. Usage:
  *
  *   sbt "runMain graft.examples.CorpusPipeline [sfDir]"
  */
object CorpusPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("corpus-pipeline")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // scalastyle:off println
    val total = graft.Tables.documents(spark, sfDir).count()
    println(s"corpus: $total documents ($sfDir)")

    // 1. filtering funnel
    TextQueries.corpusBlocklist(spark, sfDir)
      .groupBy(col("disposition")).agg(sum(col("n_docs")).as("n"))
      .collect().sortBy(_.getString(0))
      .foreach(r => println(f"  ${r.getString(0)}%-16s ${r.getLong(1)}%6d docs"))

    // 2. quality distribution of the kept set
    val q = TextQueries.txtQuality(spark, sfDir)
      .agg(min(col("quality")).as("lo"), avg(col("quality")).as("mean"),
        max(col("quality")).as("hi")).head()
    println(f"quality: min ${q.getDouble(0)}%.2f  mean ${q.getDouble(1)}%.2f  max ${q.getDouble(2)}%.2f")

    // 3. dedup: exact groups, then near-dup clusters
    val exactDups = DedupQueries.dedupExact(spark, sfDir)
      .filter(col("is_duplicate") === 1).count()
    val clusters = DedupQueries.dedupCluster(spark, sfDir)
    val clustered = clusters.count()
    val toDrop = clusters.filter(col("doc_id") =!= col("cluster_id")).count()
    println(s"dedup: $exactDups exact duplicates; $clustered docs in near-dup clusters, " +
      s"$toDrop dropped keeping one per cluster")

    // 3b. boilerplate scrub: cross-document shared segments removed
    // everywhere except their canonical carrier (the C4/CCNet line-dedup
    // step); the ledger's delta is the corpus-shrink estimate
    val scrub = TextQueries.txtBoilerplateScrub(spark, sfDir)
      .agg(sum(col("n_tok_before")).as("before"), sum(col("n_tok_after")).as("after"),
        sum(col("n_seg_removed")).as("segs")).head()
    println(s"scrub: ${scrub.getLong(2)} boilerplate segments removed " +
      s"(${scrub.getLong(0)} -> ${scrub.getLong(1)} tokens)")

    // 4. split sizes
    TextQueries.splitStratified(spark, sfDir)
      .groupBy(col("split")).agg(sum(col("n_docs")).as("n"))
      .collect().sortBy(_.getString(0))
      .foreach(r => println(f"  split ${r.getString(0)}%-6s ${r.getLong(1)}%6d docs"))

    // 5. temperature-scaled rebalance: head sources down, tail up
    TextQueries.corpusMixTemperature(spark, sfDir)
      .collect().sortBy(_.getString(0)).take(5)
      .foreach(r => println(f"  mix ${r.getString(0)}%-8s ${r.getLong(1)}%5d docs " +
        f"-> ${r.getLong(3)}%5d copies (${r.getLong(2)}%4d cpm)"))

    // 6. byte-reproducible training order
    val shards = TextQueries.corpusShuffleShards(spark, sfDir)
      .groupBy(col("shard")).agg(count(lit(1)).as("n"))
      .collect().sortBy(_.getLong(0))
    println(s"shuffle: ${shards.length} shards, sizes " +
      shards.map(_.getLong(1)).mkString("/"))
    // scalastyle:on println
    spark.stop()
  }
}
