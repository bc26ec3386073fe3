package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.expressions.VectorExpressions
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table.
  *
  * Two variants, both oracle-gated:
  *  - brute-force cosine top-k: the exact baseline. Plan shape: broadcast
  *    the (tiny) query set against the candidate corpus — a broadcast
  *    nested-loop with a per-query top-k window; at 100 TB the corpus
  *    side stays partition-parallel and nothing shuffles but the k·|Q|
  *    result rows.
  *  - IVF (inverted-file) ANN: coarse-quantize candidates into C cells
  *    (here: the first C vectors serve as deterministic centroids — a
  *    production system would k-means-sample them), probe the nprobe
  *    closest cells per query, rank only those candidates. The
  *    cell-assignment join is the scale path: candidates co-partitioned
  *    by cell id, query fan-out limited to nprobe cells. The oracle
  *    replicates the IVF algorithm itself in SQL, so correctness of the
  *    approximation (not just the final ranking) is cross-checked.
  *
  * All dot products are strict left-to-right f64 folds via the native
  * codegen expression [[graft.expressions.VectorDot]] (one fused loop
  * per row inside whole-stage codegen — the HOF zip_with/aggregate form
  * is interpreted per element); DuckDB's list_dot_product evaluates
  * identically (verified empirically), so cosine values hash-match
  * across engines.
  */
object SimilarityQueries {

  private val NumQueries = 10 // query set: vec_id < 10
  private val TopK = 5
  private val NumCells = 16   // IVF centroids: vec_id < 16
  private val NumProbes = 3

  private def embedded(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.register(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("emb"))
      .withColumn("nrm", expr("sqrt(vec_dot(emb, emb))"))
      .cache()
  }

  // ------------------------------------------------- sim_topk_bruteforce
  /** Exact cosine top-k for each query vector (excluding itself). */
  def simTopKBruteForce(s: SparkSession, d: String): DataFrame = {
    val e = embedded(s, d)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"), col("nrm").as("qnrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(expr("vec_dot(emb, qemb)"), col("nrm"), col("qnrm")))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= TopK)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rn"))
  }

  val simTopKBruteForceSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < $NumQueries),
       |scored AS (
       |  SELECT query_id, vec_id,
       |    list_dot_product(emb, qemb)
       |      / (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(qemb, qemb))) AS cos
       |  FROM e CROSS JOIN q WHERE vec_id <> query_id)
       |SELECT query_id, vec_id, cos, rn FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rn
       |  FROM scored) t
       |WHERE rn <= $TopK""".stripMargin

  // -------------------------------------------------------- sim_topk_ivf
  /** IVF ANN: assign every vector to its nearest of $NumCells centroids,
    * probe the $NumProbes closest cells per query, exact-rank inside. */
  def simTopKIvf(s: SparkSession, d: String): DataFrame = {
    val e = embedded(s, d)
    val cents = e.filter(col("vec_id") < NumCells)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"), col("nrm").as("cnrm"))
    // cell assignment: nearest centroid by cosine (ties: lowest cid)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid").asc)
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("csim", cosine(expr("vec_dot(emb, cemb)"), col("nrm"), col("cnrm")))
      .withColumn("rnc", row_number().over(wAssign))
      .filter(col("rnc") === 1)
      .select(col("vec_id"), col("cid"), col("emb"), col("nrm"))
    // probes: top-nprobe cells per query
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cid").asc)
    val probes = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"), col("nrm").as("qnrm"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", cosine(expr("vec_dot(qemb, cemb)"), col("qnrm"), col("cnrm")))
      .withColumn("rnp", row_number().over(wProbe))
      .filter(col("rnp") <= NumProbes)
      .select(col("query_id"), col("cid"), col("qemb"), col("qnrm"))
    // rank candidates within probed cells
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    probes.join(assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(expr("vec_dot(emb, qemb)"), col("nrm"), col("qnrm")))
      .withColumn("rn", row_number().over(wTop).cast(LongType))
      .filter(col("rn") <= TopK)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rn"))
  }

  val simTopKIvfSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
       |cents AS (SELECT vec_id AS cid, emb AS cemb, nrm AS cnrm FROM n WHERE vec_id < $NumCells),
       |assigned AS (
       |  SELECT vec_id, cid, emb, nrm FROM (
       |    SELECT n.vec_id, cents.cid, n.emb, n.nrm,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_dot_product(n.emb, cents.cemb) / (n.nrm * cents.cnrm) DESC, cents.cid ASC) AS rnc
       |    FROM n CROSS JOIN cents) t
       |  WHERE rnc = 1),
       |probes AS (
       |  SELECT query_id, cid, qemb, qnrm FROM (
       |    SELECT n.vec_id AS query_id, cents.cid, n.emb AS qemb, n.nrm AS qnrm,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_dot_product(n.emb, cents.cemb) / (n.nrm * cents.cnrm) DESC, cents.cid ASC) AS rnp
       |    FROM n CROSS JOIN cents WHERE n.vec_id < $NumQueries) t
       |  WHERE rnp <= $NumProbes),
       |scored AS (
       |  SELECT probes.query_id, assigned.vec_id,
       |    list_dot_product(assigned.emb, probes.qemb) / (assigned.nrm * probes.qnrm) AS cos
       |  FROM probes JOIN assigned ON probes.cid = assigned.cid
       |  WHERE assigned.vec_id <> probes.query_id)
       |SELECT query_id, vec_id, cos, rn FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rn
       |  FROM scored) t
       |WHERE rn <= $TopK""".stripMargin

  // ------------------------------------------------------------------
  // ------------------------------------------------------ sim_centroids
  /** Per-label centroids, dimension-parallel: the M-step of distributed
    * k-means / class-prototype computation. posexplode fans each vector
    * to (label, dim, x) and the shuffle key is (label, dim), so no
    * reducer ever holds a whole per-label vector and hot labels spread
    * over dims — the layout that survives 100 TB (at extreme row counts
    * one would pre-aggregate per-partition float arrays map-side, at
    * the cost of the exactness below).
    *
    * Exactness: float→decimal(28,9) sums. Spark casts float→decimal
    * through double; DuckDB's direct float→decimal cast instead goes
    * through the float's SHORTEST decimal rendering and diverges in the
    * 7th digit — the oracle must spell CAST(CAST(x AS DOUBLE) AS
    * DECIMAL(28,9)) (verified empirically on this data). Mean is the
    * single allowed double division. */
  def simCentroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("x").cast(DecimalType(28, 9))).as("sum_x"))
      .select(col("label"), col("dim"), col("n_vecs"),
        (col("sum_x").cast(DoubleType) / col("n_vecs").cast(DoubleType)).as("centroid"))

  val simCentroidsSql: String =
    """SELECT label, dim, CAST(count(*) AS BIGINT) AS n_vecs,
      |  CAST(sum(CAST(CAST(embedding[dim+1] AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS centroid
      |FROM embeddings, (SELECT CAST(unnest(range(64)) AS INT) AS dim) dims
      |GROUP BY label, dim""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_bruteforce" -> (simTopKBruteForce _),
    "sim_topk_ivf"        -> (simTopKIvf _),
    "sim_centroids"       -> (simCentroids _),
  )

  val oracleSql: Map[String, String] = Map(
    "sim_topk_bruteforce" -> simTopKBruteForceSql,
    "sim_topk_ivf"        -> simTopKIvfSql,
    "sim_centroids"       -> simCentroidsSql,
  )
}
