package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.HashFunctions._
import graft.functions.VectorFunctions._
import graft.functions.TextFunctions

/** Deduplication operators for large-scale corpus pipelines: exact
  * content-hash dedup, exact n-gram Jaccard via an inverted index,
  * MinHash+LSH banding, SimHash with pigeonhole-exact banding, and
  * embedding-cosine near-dup via random-hyperplane LSH.
  *
  * Scale design: every variant avoids the O(n^2) cross join. Exact dedup
  * is one hash shuffle. Jaccard variants fan out to (doc, shingle) pairs
  * and self-join on the shingle/band key — cost proportional to real
  * collisions, not to n^2; at 100 TB one would additionally drop
  * ultra-frequent shingles (they add join fan-out but almost no Jaccard
  * signal) — not done here because it changes exact semantics. SimHash
  * banding (4 bands / 31 bits) is pigeonhole-EXACT for hamming<=3: any
  * pair within distance 3 leaves one band untouched, so banding loses
  * nothing vs brute force. MinHash banding (k=16, r=2, b=8) is the one
  * probabilistic stage: candidate recall at J=0.99 (the planted dups) is
  * 1-(1-0.99^2)^8 ~ 1-2.6e-14; candidates are then verified with exact
  * Jaccard, so precision is exact.
  *
  * All hashes are the engine-portable [[graft.functions.HashFunctions]]
  * primitives, so every stage has a bit-exact DuckDB oracle.
  */
object DedupQueries {

  // -------------------------------------------------------- dedup_exact
  /** Exact dedup: md5 content hash, one window over the hash to mark
    * canonical (min doc_id) vs duplicate rows. */
  def dedupExact(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
    Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .withColumn("n_copies", count(lit(1)).over(w))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("is_duplicate",
        (col("doc_id") =!= col("canonical_id")).cast(IntegerType))
  }

  val dedupExactSql: String =
    """SELECT doc_id, md5(text) AS content_hash,
      |  count(*) OVER (PARTITION BY md5(text)) AS n_copies,
      |  min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
      |  CAST(doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS INTEGER) AS is_duplicate
      |FROM documents""".stripMargin

  // ----------------------------------------------- dedup_ngram_jaccard
  /** Exact word-bigram Jaccard >= 0.9 via inverted shingle index: no
    * candidate pruning needed because J >= t > 0 implies a shared
    * shingle, so the shingle self-join IS the complete candidate set. */
  def dedupNgramJaccard(s: SparkSession, d: String): DataFrame = {
    val sized = Tables.documents(s, d)
      .select(col("doc_id"), shingleSet(col("text"), 2).as("sh"))
      .select(col("doc_id"), col("sh"), size(col("sh")).as("n_sh"))
    val inv = sized.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("shingle"))
    val a = inv.select(col("shingle"), col("doc_id").as("doc_a"), col("n_sh").as("n_a"))
    val b = inv.select(col("shingle"), col("doc_id").as("doc_b"), col("n_sh").as("n_b"))
    a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard", col("shared").cast(DoubleType) /
        (col("n_a") + col("n_b") - col("shared")).cast(DoubleType))
      .filter(col("jaccard") >= 0.9)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  val dedupNgramJaccardSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, ${shingleSetSql(2)} AS sh
       |  FROM (SELECT doc_id, $tokensSql AS l FROM documents)),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    len(list_intersect(a.sh, b.sh)) AS shared,
       |    len(a.sh) AS n_a, len(b.sh) AS n_b
       |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id
       |  WHERE len(a.sh) > 0 AND len(b.sh) > 0)
       |SELECT doc_a, doc_b,
       |  CAST(shared AS DOUBLE) / CAST(n_a + n_b - shared AS DOUBLE) AS jaccard
       |FROM pairs
       |WHERE CAST(shared AS DOUBLE) / CAST(n_a + n_b - shared AS DOUBLE) >= 0.9""".stripMargin

  // ------------------------------------------------- dedup_minhash_lsh
  /** MinHash (k=16) + LSH banding (r=2, b=8) over word-trigram shingles,
    * then exact-Jaccard verification of candidates at t=0.8. */
  def dedupMinhashLsh(s: SparkSession, d: String): DataFrame = {
    val K = 16
    // Cached: the shingle sets feed signature building AND both sides of
    // the verification join; signatures feed all 8 band branches. Spark
    // does no cross-branch CSE, so without the cache each reuse would
    // recompute the full tokenize→shingle→hash subtree. Both frames are
    // one row per doc — tiny relative to the corpus at any scale.
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), shingleSet(col("text"), 3).as("sh"))
      .cache()
    val ex = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
      .withColumn("h", charFoldHash(col("shingle")))
    val mhAggs = (1 to K).map(i => min(permute(col("h"), i)).as(s"mh$i"))
    val sigs = ex.groupBy(col("doc_id")).agg(mhAggs.head, mhAggs.tail: _*).cache()
    val bands = (0 until K / 2).map { t =>
      sigs.select(col("doc_id"), lit(t).as("band"),
        (col(s"mh${2 * t + 1}") * lit(P) + col(s"mh${2 * t + 2}")).as("bkey"))
    }.reduce(_ unionByName _)
    val ca = bands.select(col("band"), col("bkey"), col("doc_id").as("doc_a"))
    val cb = bands.select(col("band"), col("bkey"), col("doc_id").as("doc_b"))
    val cand = ca.join(cb, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val da = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), size(col("sh")).as("n_a"))
    val db = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), size(col("sh")).as("n_b"))
    cand.join(da, Seq("doc_a")).join(db, Seq("doc_b"))
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("shared").cast(DoubleType) /
        (col("n_a") + col("n_b") - col("shared")).cast(DoubleType))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  val dedupMinhashLshSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, ${shingleSetSql(3)} AS sh
       |  FROM (SELECT doc_id, $tokensSql AS l FROM documents)),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    len(list_intersect(a.sh, b.sh)) AS shared,
       |    len(a.sh) AS n_a, len(b.sh) AS n_b
       |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id
       |  WHERE len(a.sh) > 0 AND len(b.sh) > 0)
       |SELECT doc_a, doc_b,
       |  CAST(shared AS DOUBLE) / CAST(n_a + n_b - shared AS DOUBLE) AS jaccard
       |FROM pairs
       |WHERE CAST(shared AS DOUBLE) / CAST(n_a + n_b - shared AS DOUBLE) >= 0.8""".stripMargin

  // ----------------------------------------------------- dedup_simhash
  /** 62 bits: with the tiny synthetic vocabulary, 31-bit signatures left
    * random documents within hamming 3 of each other (11k pairs at sf
    * 0.01); 62 bits concentrates unrelated pairs near distance 31 so
    * only real near-dups survive. */
  private val SimBits = 62

  /** SimHash near-dup: 62-bit signature from per-token universal hashes,
    * 4-band bucketing (pigeonhole-exact for hamming<=3), pair output with
    * exact hamming distance. */
  def dedupSimhash(s: SparkSession, d: String): DataFrame = {
    val ex = Tables.documents(s, d)
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("t"))
      .withColumn("h", charFoldHash(col("t")))
    val bitAggs = (0 until SimBits).map(j =>
      sum(when(permute(col("h"), j) % 2L === 1L, 1L).otherwise(-1L)).as(s"b$j"))
    val bits = ex.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
    // Cached: feeds 4 band branches + both sides of the hamming join.
    val sig = bits.select(col("doc_id"),
      (0 until SimBits).map(j =>
        when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _).as("sig"))
      .cache()
    val bands = (0 until 4).map(t =>
      sig.select(col("doc_id"), lit(t).as("band"),
        shiftright(col("sig"), 16 * t).bitwiseAND(lit(65535L)).as("bkey")))
      .reduce(_ unionByName _)
    val ca = bands.select(col("band"), col("bkey"), col("doc_id").as("doc_a"))
    val cb = bands.select(col("band"), col("bkey"), col("doc_id").as("doc_b"))
    val cand = ca.join(cb, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val sa = sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val sb = sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    cand.join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)").cast(LongType))
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  val dedupSimhashSql: String = {
    val bitCols = (0 until SimBits).map(j =>
      s"CAST(sum(CASE WHEN ((h*(${2 * j + 3})+(${j.toLong * j + 7})) % $P) % 2 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS b$j")
      .mkString(",\n    ")
    val sigExpr = (0 until SimBits).map(j =>
      s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest($tokensSql) AS t FROM documents),
       |th AS (
       |  SELECT doc_id, ${charFoldHashSql("t")} AS h FROM toks),
       |bits AS (
       |  SELECT doc_id,
       |    $bitCols
       |  FROM th GROUP BY doc_id),
       |sig AS (
       |  SELECT doc_id, CAST($sigExpr AS BIGINT) AS sig FROM bits)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin
  }

  // ------------------------------------------- dedup_embedding_cosine
  /** Embedding near-dup at cosine >= 0.95: 16-bit random-hyperplane
    * signatures, 4-band bucketing for candidates, exact f64 cosine
    * verification. The oracle brute-forces all pairs — safe to compare
    * because banding only prunes candidates that exact verification
    * would reject anyway at this threshold/data. */
  def dedupEmbeddingCosine(s: SparkSession, d: String): DataFrame = {
    // Cached: signatures + norms feed 4 band branches and both sides of
    // the cosine-verification join (no cross-branch CSE in Spark).
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("emb"))
      .withColumn("nrm", norm(col("emb")))
      .withColumn("sig", hyperplaneSignature(col("emb"), 64, 16))
      .cache()
    val bands = (0 until 4).map(t =>
      e.select(col("vec_id"), lit(t).as("band"),
        shiftright(col("sig"), 4 * t).bitwiseAND(lit(15L)).as("bkey")))
      .reduce(_ unionByName _)
    val ca = bands.select(col("band"), col("bkey"), col("vec_id").as("vec_a"))
    val cb = bands.select(col("band"), col("bkey"), col("vec_id").as("vec_b"))
    val cand = ca.join(cb, Seq("band", "bkey"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()
    val ea = e.select(col("vec_id").as("vec_a"), col("emb").as("emb_a"), col("nrm").as("nrm_a"))
    val eb = e.select(col("vec_id").as("vec_b"), col("emb").as("emb_b"), col("nrm").as("nrm_b"))
    cand.join(ea, Seq("vec_a")).join(eb, Seq("vec_b"))
      .withColumn("cos", cosine(dot(col("emb_a"), col("emb_b")), col("nrm_a"), col("nrm_b")))
      .filter(col("cos") >= 0.95)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  val dedupEmbeddingCosineSql: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      |  FROM embeddings),
      |pairs AS (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    list_dot_product(a.emb, b.emb)
      |      / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) AS cos
      |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
      |SELECT vec_a, vec_b, cos FROM pairs WHERE cos >= 0.95""".stripMargin

  // ------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact"            -> (dedupExact _),
    "dedup_ngram_jaccard"    -> (dedupNgramJaccard _),
    "dedup_minhash_lsh"      -> (dedupMinhashLsh _),
    "dedup_simhash"          -> (dedupSimhash _),
    "dedup_embedding_cosine" -> (dedupEmbeddingCosine _),
  )

  val oracleSql: Map[String, String] = Map(
    "dedup_exact"            -> dedupExactSql,
    "dedup_ngram_jaccard"    -> dedupNgramJaccardSql,
    "dedup_minhash_lsh"      -> dedupMinhashLshSql,
    "dedup_simhash"          -> dedupSimhashSql,
    "dedup_embedding_cosine" -> dedupEmbeddingCosineSql,
  )
}
