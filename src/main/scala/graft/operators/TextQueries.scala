package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis query surface over the `documents` table: token
  * statistics, quality scoring, language ID, and order-sensitive
  * fingerprints — the cheap narrow-projection stages that front a
  * large-scale training-data pipeline. Everything is a per-row map +
  * one small aggregate, so the plans are a single scan with no joins;
  * at 100 TB these run at I/O speed.
  */
object TextQueries {

  /** Common DuckDB lambda for whitespace tokens (mirrors
    * TextFunctions.tokens: split on runs of spaces, drop empties). */
  private val DTokens = "list_filter(string_split_regex(trim(text), ' +'), t -> t <> '')"

  // ---------------------------------------------------------- txt_stats
  /** Corpus statistics per language: document counts and exact token /
    * sub-word / punctuation / stopword totals. */
  def txtStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text"))).as("total_tokens"),
        sum(regexTokenCount(col("text"))).as("total_subword_tokens"),
        sum(punctCount(col("text"))).as("total_punct"),
        sum(stopwordCount(col("text"))).as("total_stopwords"),
        max(length(col("text")).cast(LongType)).as("max_chars"))

  val txtStatsSql: String =
    s"""SELECT lang, count(*) AS n_docs,
       |  CAST(sum(len($DTokens)) AS BIGINT) AS total_tokens,
       |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))) AS BIGINT) AS total_subword_tokens,
       |  CAST(sum(len(regexp_extract_all(text, '[.,!?;:]'))) AS BIGINT) AS total_punct,
       |  CAST(sum(len(list_filter($DTokens, t -> t IN ('the','a','of','and','to','in')))) AS BIGINT) AS total_stopwords,
       |  CAST(max(length(text)) AS BIGINT) AS max_chars
       |FROM documents GROUP BY lang""".stripMargin

  // -------------------------------------------------------- txt_quality
  /** Per-document quality metrics (the pre-filter columns a data
    * pipeline materializes before expensive stages). */
  def txtQuality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        meanTokenLength(col("text")).as("mean_token_len"),
        stopwordRatio(col("text")).as("stop_ratio"),
        qualityScore(col("text")).as("quality"))

  val txtQualitySql: String =
    s"""SELECT doc_id,
       |  CAST(len($DTokens) AS BIGINT) AS n_tokens,
       |  CASE WHEN len($DTokens) = 0 THEN 0.0
       |       ELSE CAST(list_sum(list_transform($DTokens, t -> CAST(length(t) AS BIGINT))) AS DOUBLE)
       |            / CAST(len($DTokens) AS DOUBLE) END AS mean_token_len,
       |  CASE WHEN len($DTokens) = 0 THEN 0.0
       |       ELSE CAST(len(list_filter($DTokens, t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
       |            / CAST(len($DTokens) AS DOUBLE) END AS stop_ratio,
       |  least(CAST(len($DTokens) AS DOUBLE) / 64.0, 1.0) * 0.4
       |  + least((CASE WHEN len($DTokens) = 0 THEN 0.0
       |           ELSE CAST(len(list_filter($DTokens, t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
       |                / CAST(len($DTokens) AS DOUBLE) END) * 4.0, 1.0) * 0.3
       |  + (CASE WHEN (CASE WHEN len($DTokens) = 0 THEN 0.0
       |           ELSE CAST(list_sum(list_transform($DTokens, t -> CAST(length(t) AS BIGINT))) AS DOUBLE)
       |                / CAST(len($DTokens) AS DOUBLE) END) BETWEEN 3.0 AND 8.0
       |      THEN 1.0 ELSE 0.5 END) * 0.3 AS quality
       |FROM documents""".stripMargin

  // --------------------------------------------------------- txt_langid
  /** Language-ID confusion matrix: labeled lang × predicted lang.
    *
    * Relational form of [[graft.functions.TextFunctions.languageId]]:
    * the Column version evaluates ~2 interpreted array-HOF filters per
    * language per row (each re-tokenizing the text), which profiled as
    * the slowest text query. Here the text is tokenized ONCE
    * (explode_outer keeps zero-token documents), each language's marker
    * hits are a codegen'd conditional sum, and the argmax/tie order is
    * identical. Scale shape: map-side explode + partially-aggregated
    * groupBy(doc) — no HOFs anywhere. */
  def txtLangId(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d).select(col("doc_id"), col("lang"),
      explode_outer(split(trim(col("text")), " +")).as("tok"))
    val scoreAggs = LangMarkers.map { case (l, ms) =>
      sum(when(col("tok").isin(ms: _*), 1L).otherwise(0L)).as(s"s_$l")
    }
    val scored = tok.groupBy(col("doc_id"), col("lang"))
      .agg(scoreAggs.head, scoreAggs.tail: _*)
    val anyHit = LangMarkers.map(lm => col(s"s_${lm._1}")).reduce(_ + _) > 0
    val best = LangMarkers.foldLeft(lit(-1L) -> lit("und")) {
      case ((bestScore, bestLang), (l, _)) =>
        val take = col(s"s_$l") > bestScore
        (when(take, col(s"s_$l")).otherwise(bestScore),
          when(take, lit(l)).otherwise(bestLang))
    }._2
    scored
      .select(col("lang"), when(anyHit, best).otherwise(lit("und")).as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
  }

  private val langScoreSql: Map[String, String] = LangMarkers.map { case (l, ms) =>
    l -> s"len(list_filter($DTokens, t -> t IN (${ms.map("'" + _ + "'").mkString(",")})))"
  }.toMap

  val txtLangIdSql: String = {
    val ss = LangMarkers.map(_._1).map(l => s"${langScoreSql(l)} AS s_$l").mkString(",\n  ")
    val total = LangMarkers.map(_._1).map(l => s"s_$l").mkString(" + ")
    val m = s"greatest(${LangMarkers.map(_._1).map(l => s"s_$l").mkString(", ")})"
    val cases = LangMarkers.map(_._1).map(l => s"WHEN s_$l = $m THEN '$l'").mkString(" ")
    s"""SELECT lang, predicted, count(*) AS n_docs FROM (
       |  SELECT lang,
       |    CASE WHEN ($total) = 0 THEN 'und' $cases END AS predicted
       |  FROM (SELECT lang, $ss FROM documents) scores
       |) t GROUP BY lang, predicted""".stripMargin
  }

  // --------------------------------------------------- txt_fingerprint
  /** Order-sensitive rolling-hash fingerprint per document, plus the
    * count of documents sharing it (content-identity groups). */
  def txtFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))

  val txtFingerprintSql: String =
    s"""SELECT doc_id,
       |  list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform($DTokens,
       |        t -> CAST(length(t) AS BIGINT) * 17 + CAST(ascii(t) AS BIGINT))),
       |    (h, x) -> (h * 31 + x) % 1000000007) AS fp
       |FROM documents""".stripMargin

  // ------------------------------------------------------- txt_bpe_vocab
  /** BPE-style subword tokenization + vocabulary histogram — the token-
    * counting stage of a training-data pipeline, with a fixed merge
    * table (the artifact a BPE trainer would emit). Each word is split
    * to characters and the merge rules are applied in priority order,
    * each replacing all occurrences (the standard fast BPE encode);
    * later merges compose earlier ones ("s c"+"a n"→"sc an"→"scan").
    * Scale shape: explode to words map-side, a chain of codegen'd
    * string replaces (no HOFs — see the round-1 perf notes), then one
    * partially-aggregated groupBy(token) whose output is vocabulary-
    * sized, so the shuffle is tiny regardless of corpus size. */
  private val BpeMerges: Seq[(String, String)] = Seq(
    "t h" -> "th", "a n" -> "an", "i n" -> "in", "e r" -> "er",
    "a r" -> "ar", "o r" -> "or", "s t" -> "st", "o w" -> "ow",
    "th e" -> "the", "s c" -> "sc", "sc an" -> "scan",
    "j o" -> "jo", "jo in" -> "join", "w in" -> "win", "d ow" -> "dow",
    "win dow" -> "window", "b a" -> "ba", "t c" -> "tc",
    "ba tc" -> "batc", "batc h" -> "batch",
    "s p" -> "sp", "sp ar" -> "spar", "spar k" -> "spark")

  def txtBpeVocab(s: SparkSession, d: String): DataFrame = {
    val words = Tables.documents(s, d)
      .select(explode(split(trim(col("text")), " +")).as("word"))
      .filter(length(col("word")) > 0)
    val spaced = trim(regexp_replace(col("word"), "(.)", "$1 "))
    val merged = BpeMerges.foldLeft(spaced) { case (c, (pair, tok)) =>
      call_function("replace", c, lit(pair), lit(tok))
    }
    words.select(explode(split(merged, " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(60)
  }

  val txtBpeVocabSql: String = {
    val chain = BpeMerges.foldLeft("trim(regexp_replace(word, '(.)', '\\1 ', 'g'))") {
      case (acc, (pair, tok)) => s"replace($acc, '$pair', '$tok')"
    }
    s"""SELECT token, count(*) AS n FROM (
       |  SELECT unnest(string_split($chain, ' ')) AS token
       |  FROM (SELECT unnest($DTokens) AS word FROM documents) words
       |) toks GROUP BY token ORDER BY n DESC, token LIMIT 60""".stripMargin
  }

  // ------------------------------------------------------ txt_bigram_lm
  /** Corpus-model scoring — the two-pass pattern behind model-based
    * quality filters: pass 1 aggregates a bigram frequency table over
    * the whole corpus, pass 2 joins it back and scores each document by
    * the average corpus frequency of its bigrams (an integer-exact
    * stand-in for LM log-prob, which would hash-flake across engines'
    * libm). Scale shape: bigrams built relationally (posexplode + one
    * lead window per doc), frequency table is vocabulary²-bounded (in
    * practice Zipfian-small), and the score join shuffles on the bigram
    * key; the final division is the single allowed double op. */
  def txtBigramLm(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(s, d).select(col("doc_id"),
      posexplode(split(trim(col("text")), " +")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bg = tok.withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("nxt")).as("bigram"))
    val counts = bg.groupBy(col("bigram")).agg(count(lit(1)).as("bg_freq"))
    bg.join(counts, "bigram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bg_freq")).as("sum_freq"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_freq"),
        (col("sum_freq").cast(DoubleType) / col("n_bigrams").cast(DoubleType)).as("avg_freq"))
  }

  val txtBigramLmSql: String =
    s"""WITH toks AS (SELECT doc_id, $DTokens AS l FROM documents),
       |bg AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram
       |  FROM toks),
       |counts AS (SELECT bigram, count(*) AS bg_freq FROM bg GROUP BY bigram)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_bigrams,
       |  CAST(sum(bg_freq) AS BIGINT) AS sum_freq,
       |  CAST(CAST(sum(bg_freq) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_freq
       |FROM bg JOIN counts USING (bigram)
       |GROUP BY doc_id""".stripMargin

  // ------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_stats"       -> (txtStats _),
    "txt_quality"     -> (txtQuality _),
    "txt_langid"      -> (txtLangId _),
    "txt_fingerprint" -> (txtFingerprint _),
    "txt_bpe_vocab"   -> (txtBpeVocab _),
    "txt_bigram_lm"   -> (txtBigramLm _),
  )

  val oracleSql: Map[String, String] = Map(
    "txt_stats"       -> txtStatsSql,
    "txt_quality"     -> txtQualitySql,
    "txt_langid"      -> txtLangIdSql,
    "txt_fingerprint" -> txtFingerprintSql,
    "txt_bpe_vocab"   -> txtBpeVocabSql,
    "txt_bigram_lm"   -> txtBigramLmSql,
  )
}
