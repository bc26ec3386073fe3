package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Partition-count independence: the whole point of the engine's
  * determinism idioms (integer cents, cross-multiplied thresholds,
  * total-order top-k tiebreaks, fixed-point ratios) is that results are
  * BIT-IDENTICAL no matter how the cluster splits the work — the same
  * answer at 1 executor or 1000. This suite re-runs a representative
  * query from every family under deliberately mismatched
  * `spark.sql.shuffle.partitions` (a prime, and 1) in cloned sessions
  * and asserts the canonicalized results are equal.
  *
  * A failure here means some aggregate depends on shuffle/merge order
  * (e.g. a float accumulator or a non-total sort) — exactly the class
  * of bug the cross-engine oracle can miss when both engines happen to
  * batch the same way.
  */
class DeterminismSpec extends AnyFunSuite {

  private lazy val base = SparkSpecBase.session
  private val sfDir = "/root/testdata/sf0.001"

  /** Canonical form: rows → sorted string lines (column order kept,
    * values rendered; NaN folded to a stable token). */
  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case d: Double if d.isNaN => "NaN"
      case v => String.valueOf(v)
    }.mkString("")).sorted.toSeq

  private val representatives: Seq[(String, String)] = Seq(
    "q01_pricing_summary"  -> "relational agg",
    "q47_top_per_group"    -> "native bounded top-k",
    "q59_dormant_rich"     -> "anti-join + cross-multiplied threshold",
    "q61_snapshot_diff"    -> "full-outer reconciliation",
    "dedup_minhash_lsh"    -> "banded LSH self-join",
    "sim_topk_bruteforce"  -> "broadcast cosine top-k",
    "sim_trunc_audit"      -> "double ranking overlap",
    "txt_surprisal"        -> "integer bit-count LM",
    "txt_freq_spectrum"    -> "log-bucket vocabulary",
    "corpus_token_budget"  -> "largest-remainder apportionment",
    "corpus_refresh"       -> "snapshot merge",
    "mm_wav_energy"        -> "decoded-sample chunk energy",
    "fmt_schema_merge"     -> "mergeSchema evolution",
    "fmt_zorder_layout"    -> "grid-scaled bit interleave",
    "txt_cms_heavy"        -> "count-min sketch + exact audit",
    "sim_graph_lpa"        -> "synchronous label propagation",
    "q62_gap_fill"         -> "dense calendar + LOCF carry",
    "q63_peak_concurrency" -> "sweep-line running sum",
    "fmt_hilbert_layout"   -> "codegen Hilbert curve index",
    "corpus_filter_overlap" -> "filter bitmask partition",
    "sim_binary_hamming"   -> "sign-bit Hamming top-k with integer ties",
    "q64_order_count_dist" -> "zero-preserving left-join histogram",
    "q65_sole_late_supplier" -> "per-order tally residual (was semi+anti joins)",
    "q66_auto_topk"        -> "window form (TopKRewrite rewrites under extensions)",
    "corpus_shuffle_shards" -> "salted-hash training order",
    "mm_binary_files"      -> "binaryFile source + per-file decode",
    "dedup_minhash_oph"    -> "one-permutation minhash + densification",
    "dedup_cdc_chunks"     -> "content-defined chunk boundaries",
    "sim_graph_jaccard"    -> "wedge-join common neighbors",
    "q67_sql_text"         -> "verbatim ANSI SQL surface",
    "q68_not_in_nulls"     -> "null-aware NOT IN",
    "corpus_mix_temperature" -> "fixed-point alpha-sampling",
    "mm_image_hist"        -> "decoded-pixel quartile histogram",
    "sim_rerank_two_stage" -> "integer-pool prefilter + exact re-rank",
    "sim_filtered_topk"    -> "pre-filter label predicate",
    "dedup_incremental"    -> "batch-vs-index disposition routing",
    "fmt_compaction"       -> "range-compacted file layout",
    "q69_scd2_intervals"   -> "lead-closed validity ranges",
    "sim_semantic_dedup"   -> "kmeans-confined cosine prune",
    "dedup_embedding_cosine" -> "ranked LSH candidates with dup verdict",
    "sim_mips_ivf"         -> "norm-augmented inner-product IVF",
    "txt_ppl_buckets"      -> "per-source perplexity tertiles",
    "mm_phash"             -> "integer aHash collision groups")

  for ((name, what) <- representatives)
    test(s"$name ($what) is identical at shuffle.partitions = 1 and 7") {
      val fn = SparkEntry.queries(name)
      val s1 = base.newSession()
      s1.conf.set("spark.sql.shuffle.partitions", "1")
      val s7 = base.newSession()
      s7.conf.set("spark.sql.shuffle.partitions", "7")
      val r1 = canon(fn(s1, sfDir))
      val r7 = canon(fn(s7, sfDir))
      assert(r1 == r7,
        s"$name drifted under repartitioning: ${r1.size} vs ${r7.size} rows " +
          s"or differing values\nfirst diff: ${r1.zipAll(r7, "<none>", "<none>")
            .find { case (a, b) => a != b }}")
      assert(r1.nonEmpty, s"$name returned no rows — vacuous determinism check")
    }
}
