package graft.operators

import graft.SparkSpecBase

class SimilarityQueriesSpec extends SparkSpecBase {
  import spark.implicits._

  /** lastScratchDir lookup with a clear assertion instead of an NPE when
    * the producing query failed before allocating its scratch dir
    * (ADVICE r9: a null path would mask the real failure). */
  private def scratchDirOf(tag: String): String =
    Option(SimilarityQueries.lastScratchDir.get(tag))
      .getOrElse(fail(s"no scratch dir recorded for $tag"))

  test("hybrid RRF: fusion arithmetic exact, both legs contribute, both-leg hits dominate") {
    val rows = SimilarityQueries.simHybridRrf(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("query_id")).distinct.length == 5)
    def rrf(r: Option[Long]): Long = r.map(x => 1000000000L / (60L + x)).getOrElse(0L)
    rows.foreach { r =>
      val s = Option(r.getAs[java.lang.Long]("srank")).map(_.longValue)
      val dn = Option(r.getAs[java.lang.Long]("drank")).map(_.longValue)
      assert(s.isDefined || dn.isDefined, "a fused row must come from some leg")
      assert(r.getAs[Long]("rrf_fp") == rrf(s) + rrf(dn), "fusion arithmetic")
    }
    // a candidate surfaced by BOTH legs at rank 1 beats any single-leg
    // candidate: 2/(60+20) > 1/61, so if any both-leg hit exists in the
    // depth-20 frontier it must outrank every single-leg-only top hit
    val haveBoth = rows.exists(r => r.getAs[java.lang.Long]("srank") != null &&
      r.getAs[java.lang.Long]("drank") != null)
    val haveSparseOnly = rows.exists(r => r.getAs[java.lang.Long]("drank") == null)
    val haveDenseOnly = rows.exists(r => r.getAs[java.lang.Long]("srank") == null)
    assert(haveSparseOnly && haveDenseOnly,
      "fusion must surface candidates each leg found alone (legs are not redundant)")
    // fused output is not just either leg truncated: at least one top-5
    // ordering position differs from the pure sparse top-5
    val sparseTop = TextQueries.txtBm25(spark, sfDir)
      .selectExpr("CAST(query_id AS BIGINT)", "doc_id", "rank")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._3) -> r._2).toMap
    val fusedTop = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
      r.getAs[Long]("id")).toMap
    assert(fusedTop != sparseTop, "fusion must differ from the sparse leg alone")
    if (!haveBoth)
      info("no both-leg candidate in this corpus's depth-20 frontiers (allowed)")
  }

  test("brute force returns exactly top-k per query, ranked") {
    val rows = SimilarityQueries.simTopKBruteForce(spark, sfDir)
      .as[(Long, Long, Double, Long)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.values.foreach { g =>
      assert(g.length == 5)
      val sorted = g.sortBy(_._4)
      // rank order must agree with descending cosine
      assert(sorted.map(_._3).sliding(2).forall { case Array(a, b) => a >= b case _ => true })
    }
    rows.foreach { case (q, v, c, _) =>
      assert(q != v); assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("binary-hamming signatures agree with a naive sign-bit count") {
    import org.apache.spark.sql.functions._
    val rows = SimilarityQueries.simBinaryHamming(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.values.foreach { g =>
      assert(g.length == 5)
      // rank order must agree with ascending hamming distance
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._3).sliding(2).forall {
        case Array(a, b) => a <= b case _ => true })
    }
    rows.foreach { case (q, v, h, _) =>
      assert(q != v); assert(h >= 0L && h <= 64L)
    }
    // cross-check the packed two-word signature against a naive
    // per-dimension disagreement count computed driver-side
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def bits(v: Array[Float]): Array[Boolean] = v.map(_ > 0f)
    rows.take(20).foreach { case (q, v, h, _) =>
      val naive = bits(emb(q)).zip(bits(emb(v))).count { case (a, b) => a != b }
      assert(naive.toLong == h, s"($q,$v): packed $h vs naive $naive")
    }
  }

  test("graph jaccard: scores match a driver-side recompute from the kNN edges") {
    val edges = SimilarityQueries.simKnnGraph(spark, sfDir)
      .select("src_id", "nbr_id").as[(Long, Long)].collect()
    val nbrs: Map[Long, Set[Long]] = (edges.toSet ++ edges.map(e => (e._2, e._1)))
      .groupBy((p: (Long, Long)) => p._1)
      .map { case (v, es) => v -> es.map(_._2) }
    val rows = SimilarityQueries.simGraphJaccard(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, shared, jacFp) =>
      assert(a < b)
      val expShared = (nbrs(a) intersect nbrs(b)).size.toLong
      assert(shared == expShared && shared >= 2, s"($a,$b)")
      val union = nbrs(a).size + nbrs(b).size - expShared
      assert(jacFp == expShared * 1000000L / union, s"($a,$b) jaccard")
    }
    // completeness: every >=2-common-neighbor pair is reported
    val expPairs = (for {
      (a, na) <- nbrs.toSeq; (b, nb) <- nbrs.toSeq if a < b
      if (na intersect nb).size >= 2
    } yield (a, b)).toSet
    assert(rows.map(r => (r._1, r._2)).toSet == expPairs)
  }

  test("filtered top-k: every neighbor shares the query's label (pre-filter semantics)") {
    import org.apache.spark.sql.functions._
    val labels = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("long"))
      .as[(Long, Long)].collect().toMap
    val rows = SimilarityQueries.simFilteredTopK(spark, sfDir)
      .as[(Long, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, v, _, _) =>
      assert(q != v)
      assert(labels(v) == labels(q), s"neighbor $v breaks query $q's filter")
    }
    // pre-filter returns the true filtered top-k: per query, row count
    // is min(k, |label cohort| - 1)
    rows.groupBy(_._1).foreach { case (q, g) =>
      val cohort = labels.values.count(_ == labels(q)) - 1
      assert(g.length == math.min(5, cohort), s"query $q: ${g.length} of $cohort")
    }
  }

  test("two-stage rerank: exact scores, high recall vs brute force, pool-bounded") {
    val exact = SimilarityQueries.simTopKBruteForce(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val rr = SimilarityQueries.simRerankTwoStage(spark, sfDir)
      .as[(Long, Long, Double, Long)].collect()
    assert(rr.length == 50) // 10 queries x top-5
    // stage 2 is EXACT cosine: every returned score must equal the
    // brute-force score for that pair
    val bf = SimilarityQueries.simTopKBruteForce(spark, sfDir)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    rr.foreach { case (q, v, c, _) =>
      bf.get((q, v)).foreach(exp => assert(c == exp, s"($q,$v) score drifted"))
    }
    // a 50-candidate binary pool over ~1000 vectors recovers most of
    // the true top-5 (sign-bit Hamming is a faithful cosine proxy)
    val recall = (exact intersect rr.map(r => (r._1, r._2)).toSet).size.toDouble / exact.size
    assert(recall >= 0.5, s"two-stage recall $recall suspiciously low")
  }

  test("LSH ANN finds a reasonable fraction of the exact neighbors") {
    val exact = SimilarityQueries.simTopKBruteForce(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val lsh = SimilarityQueries.simTopKLsh(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect lsh).size.toDouble / exact.size
    // 4 bands of 4 hyperplane bits: near-neighbors collide in some band
    // far more often than random vectors do
    assert(recall >= 0.2, s"LSH recall $recall suspiciously low")
    lsh.foreach { case (q, v) => assert(q != v) }
  }

  test("range search returns only true matches and never a false positive") {
    import org.apache.spark.sql.functions._
    val rows = SimilarityQueries.simRangeSearch(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty, "threshold is tuned so the corpus carries real matches")
    rows.foreach { case (q, v, c) =>
      assert(q < 10 && v != q)
      assert(c >= 0.3, s"radius violated: ($q,$v,$c)")
    }
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length, "no duplicate pairs")
    // soundness vs brute force: every returned pair must be a true
    // range match when scored exactly (banding can miss, never invent)
    val exact = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val a = exact.select(col("vec_id").as("qid"), col("emb").as("qemb"))
      .where(col("qid") < 10)
    val truePairs = exact.crossJoin(a)
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (expr("aggregate(zip_with(emb, qemb, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
          (sqrt(expr("aggregate(transform(emb, x -> x * x), 0D, (acc, x) -> acc + x)")) *
           sqrt(expr("aggregate(transform(qemb, x -> x * x), 0D, (acc, x) -> acc + x)")))).as("cos"))
      .where(col("cos") >= 0.3)
      .select(col("qid"), col("vec_id")).as[(Long, Long)].collect().toSet
    assert(rows.map(r => (r._1, r._2)).toSet.subsetOf(truePairs),
      "LSH-gated results must be a subset of the exact range set")
  }

  test("kmeans partitions every vector and reports non-negative inertia") {
    val rows = SimilarityQueries.simKmeans(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    val nVecs = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(rows.map(_._2).sum == nVecs, "clusters must partition the corpus")
    assert(rows.length <= 8)
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (_, n, inertia) =>
      assert(n > 0); assert(inertia >= 0.0)
    }
  }

  test("MIPS via norm augmentation equals an independent from-scratch recompute") {
    val got = SimilarityQueries.queries("sim_mips_ivf")(spark, sfDir)
      .as[(Long, Long, Double, Long)].collect()
      .map { case (q, v, ip, rn) => (q, rn) -> (v, ip) }.toMap
    // third implementation: plain Scala replay of augmentation, cell
    // assignment, probing, and exact inner-product ranking
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; for (i <- a.indices) s += a(i) * b(i); s
    }
    val nrm = emb.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    val bigM = nrm.values.max
    val aug = emb.map { case (id, v) =>
      id -> (v :+ math.sqrt(math.max(bigM * bigM - nrm(id) * nrm(id), 0.0)))
    }
    val cents = aug.filter(_._1 < 16).toSeq.sortBy(_._1)
    val cellOf = aug.map { case (id, a) =>
      id -> cents.map { case (cid, c) => (-dot(a, c), cid) }.min._2
    }
    for (q <- emb.keys.filter(_ < 10)) {
      val qaug = emb(q) :+ 0.0
      val probed = cents.map { case (cid, c) => (-dot(qaug, c), cid) }
        .sorted.take(3).map(_._2).toSet
      val want = emb.keys.filter(v => v != q && probed(cellOf(v))).toSeq
        .map(v => (-dot(emb(v), emb(q)), v)).sorted.take(5)
      want.zipWithIndex.foreach { case ((negIp, v), i) =>
        val (gv, gip) = got((q, i + 1L))
        assert(gv == v && gip == -negIp,
          s"query $q rank ${i + 1}: got ($gv,$gip) want ($v,${-negIp})")
      }
    }
    assert(got.size == 50, s"10 queries x top-5 expected, got ${got.size}")
  }

  test("semantic dedup prunes within clusters; keeper is a chain-head survivor") {
    val pruned = SimilarityQueries.simSemanticDedup(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(pruned.nonEmpty, "tau=0.4 must fire on this corpus (p99.95)")
    val ids = pruned.map(_._1).toSet
    pruned.foreach { case (vecId, _, keeper, nNear, maxCos) =>
      assert(keeper < vecId, "chains follow strictly decreasing ids")
      assert(nNear >= 1)
      assert(maxCos >= 0.4 && maxCos <= 1.0)
      // the load-bearing chain-head guarantee: a keeper is NEVER itself
      // pruned, so deleting the pruned set and remapping references to
      // `keeper` can never point at a deleted vector
      assert(!ids.contains(keeper),
        s"keeper $keeper of $vecId is itself pruned — chain not resolved")
    }
    // soundness against brute force: every pruned vector genuinely has
    // SOME lower-id neighbor within tau (the pruning evidence), and
    // max_cos never exceeds the exact max over all lower-id cosines
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    pruned.foreach { case (vecId, _, _, _, maxCos) =>
      val lowerCos = emb.keysIterator.filter(_ < vecId)
        .map(k => cos(emb(vecId), emb(k))).toSeq
      assert(lowerCos.exists(_ >= 0.4),
        s"$vecId pruned without any lower-id in-tau neighbor in exact recompute")
      assert(maxCos <= lowerCos.max + 1e-9,
        s"$vecId max_cos $maxCos exceeds exact max ${lowerCos.max}")
    }
    // pruning is selective, not a mass deletion, on this corpus
    assert(ids.size < emb.size / 2, s"pruned ${ids.size} of ${emb.size}")
  }

  test("kmeans assigns via broadcast (the corpus is never shuffled to the centroids)") {
    val plan = SimilarityQueries.simKmeans(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("top-k and argmin plans are hash aggregates, not Sort+Window funnels") {
    // The window formulation would sort-shuffle corpus×K scored rows
    // (each carrying embedding arrays) into one reducer per key; the
    // bounded TopKAggregator / array-argmin formulations must plan as
    // map-side-partial hash aggregates with no Window and no Sort.
    for (n <- Seq("sim_topk_bruteforce", "sim_topk_ivf", "sim_topk_lsh", "sim_kmeans")) {
      val plan = SimilarityQueries.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$n plans a Window:\n$plan")
      assert(!plan.contains("Sort "), s"$n plans a Sort:\n$plan")
      assert(plan.contains("HashAggregate"), s"$n lost its hash aggregate:\n$plan")
    }
  }

  test("knn graph: bounded degree, no self-loops, ranked by cosine") {
    val rows = SimilarityQueries.simKnnGraph(spark, sfDir)
      .as[(Long, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s, n, c, _) =>
      assert(s != n, "self-loop in knn graph")
      assert(c >= -1.0 && c <= 1.0)
    }
    val bySrc = rows.groupBy(_._1)
    // most vertices should find band-mates on random 64-dim vectors
    val nVecs = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(bySrc.size.toDouble / nVecs > 0.9,
      s"only ${bySrc.size} of $nVecs vertices have neighbors")
    bySrc.values.foreach { g =>
      assert(g.length <= 3, s"degree ${g.length} exceeds k")
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to g.length).toSeq, "ranks not dense")
      assert(sorted.map(_._3).sliding(2).forall {
        case Array(a, b) => a >= b
        case _ => true
      }, "cosine not non-increasing in rank")
    }
  }

  test("knn graph plans as bounded hash aggregate, not Sort+Window") {
    val plan = SimilarityQueries.simKnnGraph(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"knn graph plans a Window:\n$plan")
    assert(!plan.contains("Sort "), s"knn graph plans a Sort:\n$plan")
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("CartesianProduct"), s"knn graph went all-pairs:\n$plan")
  }

  test("PQ top-k: k ranked candidates per query, distances non-decreasing") {
    val rows = SimilarityQueries.simPqTopK(spark, sfDir)
      .as[(Long, Long, Double, Long)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.values.foreach { g =>
      assert(g.length == 5)
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to 5L), "ranks not dense")
      assert(sorted.map(_._3).sliding(2).forall {
        case Array(a, b) => a <= b
        case _ => true
      }, "ADC distance must be non-decreasing in rank")
    }
    rows.foreach { case (q, v, d, _) =>
      assert(q != v, "self-match in PQ top-k")
      assert(d >= -1e-9, s"squared-distance surrogate went negative: $d")
    }
  }

  test("PQ encode + ADC search is deterministic across runs") {
    // Codebooks are seeded (vec_id < 16) and the ADC fold is s-ordered,
    // so two runs must agree bit-for-bit — the property the oracle
    // comparison depends on.
    val a = SimilarityQueries.simPqTopK(spark, sfDir).collect().toSeq
    val b = SimilarityQueries.simPqTopK(spark, sfDir).collect().toSeq
    assert(a.toSet == b.toSet, "PQ encode/search must be deterministic")
  }

  test("PQ plan: pure-map encode + broadcast LUT, bounded top-k aggregate") {
    val plan = SimilarityQueries.simPqTopK(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"PQ plans a Window:\n$plan")
    assert(!plan.contains("Sort "), s"PQ plans a Sort:\n$plan")
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("CartesianProduct"), s"PQ went all-pairs:\n$plan")
  }

  test("graph rank: covers every vertex, conserves bounded mass, rewards in-links") {
    val rows = SimilarityQueries.simGraphRank(spark, sfDir)
      .as[(Long, Double)].collect()
    val nVecs = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(rows.length == nVecs, "every vertex gets a rank")
    rows.foreach { case (_, r) => assert(r > 0.0 && r < 1.0) }
    // total mass <= 1 (dangling mass is dropped, never invented)
    val total = rows.map(_._2).sum
    assert(total <= 1.0 + 1e-9, s"rank mass exceeds 1: $total")
    assert(total >= 0.15, s"implausibly low mass: $total")
    // a vertex with no in-links sits at the teleport floor; linked
    // vertices must rise above it
    val floor = 0.15 / nVecs
    assert(rows.exists(_._2 > floor * 2), "no vertex accumulated in-link mass")
    assert(rows.filter(_._2 >= floor * 0.99).length == nVecs,
      "teleport term must lower-bound every vertex")
  }

  test("IVF-PQ: k ranked candidates per query, ADC distance non-decreasing") {
    val rows = SimilarityQueries.simIvfPq(spark, sfDir)
      .as[(Long, Long, Double, Long)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.values.foreach { g =>
      assert(g.length == 5)
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to 5L), "ranks not dense")
      assert(sorted.map(_._3).sliding(2).forall {
        case Array(a, b) => a <= b
        case _ => true
      }, "ADC distance must be non-decreasing in rank")
    }
    rows.foreach { case (q, v, dd, _) =>
      assert(q != v, "self-match in IVF-PQ top-k")
      assert(dd >= -1e-9, s"squared-distance surrogate went negative: $dd")
    }
  }

  test("IVF-PQ candidates come only from probed cells") {
    // Re-derive the coarse assignment and each query's probe set with
    // plain Spark SQL; every returned neighbor must live in one of its
    // query's nprobe cells — the invariant that makes IVF-PQ prune I/O.
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val cents = e.where(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"))
    val d2 = expr("aggregate(zip_with(emb, cemb, (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)")
    val ranked = e.crossJoin(cents).withColumn("d2", d2)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("d2").asc, col("cid").asc)))
    val cellOf = ranked.where(col("rn") === 1)
      .select(col("vec_id"), col("cid")).as[(Long, Long)].collect().toMap
    val probesOf = ranked.where(col("vec_id") < 10 && col("rn") <= 3)
      .select(col("vec_id"), col("cid")).as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }
    SimilarityQueries.simIvfPq(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .foreach { case (q, v) =>
        assert(probesOf(q).contains(cellOf(v)),
          s"neighbor $v of query $q sits in unprobed cell ${cellOf(v)}")
      }
  }

  test("IVF-PQ plan: pure-map encode, probed-cell equi-join, bounded top-k") {
    val plan = SimilarityQueries.simIvfPq(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"IVF-PQ plans a Window:\n$plan")
    assert(!plan.contains("Sort "), s"IVF-PQ plans a Sort:\n$plan")
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("CartesianProduct"), s"IVF-PQ went all-pairs:\n$plan")
  }

  test("graph triangles: per-vertex counts match a brute-force census") {
    import org.apache.spark.sql.functions._
    val edges = SimilarityQueries.simKnnGraph(spark, sfDir)
      .where(col("src_id") =!= col("nbr_id"))
      .select("src_id", "nbr_id").as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val adj = (edges.toSeq.map { case (a, b) => (a, b) } ++
      edges.toSeq.map { case (a, b) => (b, a) })
      .groupBy(_._1).map { case (v, g) => v -> g.map(_._2).toSet }
    val expected = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- edges; c <- adj(a) intersect adj(b) if c > b) {
      expected(a) += 1; expected(b) += 1; expected(c) += 1
    }
    val got = SimilarityQueries.simGraphTriangles(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(got == expected.toMap, "triangle census mismatch")
  }

  test("graph triangles plan: hash equi-joins only, no nested loop") {
    val plan = SimilarityQueries.simGraphTriangles(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"triangles went all-pairs:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
  }

  test("graph BFS: hop distances match a brute-force traversal") {
    import org.apache.spark.sql.functions._
    val knn = SimilarityQueries.simKnnGraph(spark, sfDir)
      .where(col("src_id") =!= col("nbr_id"))
      .select("src_id", "nbr_id").as[(Long, Long)].collect()
    val adj = (knn ++ knn.map(_.swap)).groupBy(_._1)
      .map { case (v, g) => v -> g.map(_._2).toSet }.withDefaultValue(Set.empty[Long])
    // textbook BFS from seeds {0,1,2}, depth <= 4
    val expected = scala.collection.mutable.Map[Long, Long](0L -> 0L, 1L -> 0L, 2L -> 0L)
    var frontier = Set(0L, 1L, 2L)
    for (h <- 1L to 4L) {
      frontier = frontier.flatMap(adj).filterNot(expected.contains)
      frontier.foreach(v => expected(v) = h)
    }
    val got = SimilarityQueries.simGraphBfs(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(got == expected.toMap, "BFS hop distances mismatch")
    assert(got.values.exists(_ > 1), "traversal never left the seeds' direct neighbors")
  }

  test("SQ8 quantization keeps near-exact recall vs the float top-k") {
    val exact = SimilarityQueries.simTopKBruteForce(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val sq8 = SimilarityQueries.simSq8TopK(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect sq8).size.toDouble / exact.size
    // 255 levels per dimension barely perturbs cosines — recall should
    // be near-perfect, far above the coarse-index variants
    assert(recall >= 0.8, s"SQ8 recall $recall too low for 8-bit codes")
    assert(sq8.size == exact.size)
  }

  test("IVF finds a reasonable fraction of the exact neighbors") {
    val exact = SimilarityQueries.simTopKBruteForce(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = SimilarityQueries.simTopKIvf(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    // nprobe=3/16 cells on random vectors: expect well above random hit
    assert(recall >= 0.2, s"IVF recall $recall suspiciously low")
    assert(ivf.size == exact.size)
  }

  test("index build persists cid-partitioned lists and the serve scan prunes to probed cells") {
    val df = SimilarityQueries.simIndexBuild(spark, sfDir)
    val rows = df.as[(Long, Long, Double, Long)].collect()
    // 10 probe queries x top-5, ranked by descending cosine
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.values.foreach { g =>
      assert(g.length == 5)
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._3).sliding(2).forall {
        case Array(a, b) => a >= b case _ => true })
    }
    // the persisted index is a real partitioned layout: one cid= dir per
    // non-empty inverted list, at most NumCells of them
    val idx = java.nio.file.Paths.get(
      scratchDirOf("sim_ivfidx"))
    val cellDirs = java.nio.file.Files.list(idx).iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val dirs = new scala.collection.mutable.ArrayBuffer[String]
    while (cellDirs.hasNext) { val p = cellDirs.next().getFileName.toString; if (p.startsWith("cid=")) dirs += p }
    assert(dirs.nonEmpty && dirs.size <= 16, s"unexpected cell layout: $dirs")
    // the serve-side read is directory-pruned: the cid IN (...) predicate
    // sits in PartitionFilters (no file outside a probed cell is opened)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(2000))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("cid"), pf)
  }

  test("append-maintained index serves identically to a from-scratch build") {
    // build-from-scratch over the FULL corpus (sim_index_build's dir)...
    SimilarityQueries.simIndexBuild(spark, sfDir)
    val fullIdx = scratchDirOf("sim_ivfidx")
    val e = SimilarityQueries.embedded(spark, sfDir)
    val cents = SimilarityQueries.ivfCentroids(e)
    // ...served on the append gate's query slice [20, 25)
    val scratch = SimilarityQueries.ivfServe(spark, e, cents, fullIdx, 20L, 25L)
      .as[(Long, Long, Double, Long)].collect().toSet
    // build-then-append must converge to the same physical answer
    val appended = SimilarityQueries.simIndexAppend(spark, sfDir)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(appended == scratch, "append-maintained index diverged from from-scratch build")
    assert(appended.size == 25)
  }

  test("ivf rebalance splits the busiest cell, conserves membership") {
    val rows = SimilarityQueries.simIvfRebalance(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
    val total = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    // no vector lost or duplicated by the directory rewrite
    assert(rows.map(_._2).sum == total, "rebalance changed corpus membership")
    val byCid = rows.map(r => r._1 -> r._2).toMap
    assert(byCid.contains(16L) && byCid(16L) > 0, "fresh split cell missing/empty")
    assert(rows.forall(r => r._3 >= 0 && r._3 <= r._4), "min/max order broken")
    // both halves of the split are real cells, so the pre-split busiest
    // count can no longer be attained by either half alone
    assert(byCid.size == rows.length, "duplicate cid rows")
  }

  test("norm stats: one healthy row matching a driver-side recompute") {
    val Seq((nVecs, nDims, nZero, minN2, maxN2, meanFp)) =
      SimilarityQueries.simNormStats(spark, sfDir)
        .as[(Long, Long, Long, Double, Double, Long)].collect().toSeq
    val norms = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("embedding").as[Array[Float]].collect()
      .map(_.map(_.toDouble).foldLeft(0.0)((a, x) => a + x * x))
    assert(nVecs == norms.length && nDims == 1L)
    assert(nZero == norms.count(_ == 0.0))
    assert(minN2 == norms.min && maxN2 == norms.max)
    assert(meanFp == norms.map(n => math.floor(n * 1e6).toLong).sum / norms.length)
  }

  test("ood histogram: buckets partition the corpus and bound the cosines") {
    val rows = SimilarityQueries.simOodHist(spark, sfDir)
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.map(_._2).sum ==
      spark.read.parquet(s"$sfDir/embeddings.parquet").count())
    rows.foreach { case (bucket, n, lo, hi) =>
      assert(n > 0)
      assert(lo <= hi)
      assert(math.floor(lo * 10).toLong == bucket && math.floor(hi * 10).toLong == bucket,
        s"bucket $bucket holds cosines outside its range [$lo, $hi]")
    }
    // the 16 seed vectors see themselves: a full-affinity bucket exists
    assert(rows.exists(_._1 == 10L), "seed self-match bucket missing")
  }

  test("edge histogram reconciles with the k-NN graph it summarizes") {
    val edges = SimilarityQueries.simKnnGraph(spark, sfDir)
      .select("cos", "rn").as[(Double, Long)].collect()
    val hist = SimilarityQueries.simEdgeHist(spark, sfDir)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(hist.map(_._2).sum == edges.length.toLong)
    assert(hist.map(_._3).sum == edges.count(_._2 == 1L).toLong)
    hist.foreach { case (bucket, _, _, lo, hi) =>
      assert(math.floor(lo * 10).toLong == bucket && math.floor(hi * 10).toLong == bucket)
    }
  }

  test("recall audit reports the exact per-query IVF∩exact intersection") {
    val exact = SimilarityQueries.simTopKBruteForce(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = SimilarityQueries.simTopKIvf(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val audit = SimilarityQueries.simRecallAudit(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(audit.length == exact.size, "every query must appear in the audit")
    audit.foreach { case (q, hits, recallFp) =>
      val truth = (exact(q) intersect ivf.getOrElse(q, Set.empty)).size.toLong
      assert(hits == truth, s"query $q: audit says $hits hits, truth $truth")
      assert(recallFp == hits * 1000000L / 5L)
      assert(hits >= 0L && hits <= 5L)
    }
  }

  test("sim_threshold_sweep is monotone and agrees with range search at 0.3") {
    import spark.implicits._
    val sweep = SimilarityQueries.simThresholdSweep(spark, sfDir)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(sweep.nonEmpty)
    // tightening the threshold can only shrink pairs and coverage
    sweep.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo._2 >= hi._2 && lo._3 >= hi._3,
          s"sweep not monotone: $lo then $hi")
      case _ =>
    }
    val at30 = sweep.find(_._1 == 30L).map(_._2).getOrElse(0L)
    val range = SimilarityQueries.simRangeSearch(spark, sfDir).count()
    assert(at30 == range,
      s"sweep@30 ($at30) must equal the 0.3 range-search pair count ($range)")
  }

  test("sim_trunc_audit: one row per query, recall well-formed, prefix dims carry signal") {
    import spark.implicits._
    val rows = SimilarityQueries.simTruncAudit(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 10, "one audit row per query vector")
    rows.foreach { case (_, hits, fp) =>
      assert(hits >= 0 && hits <= 5, s"hits out of range: $hits")
      assert(fp == hits * 1000000L / 5, "recall must be the exact integer ppm of hits")
    }
    // 16 of 64 dims retain SOME neighborhood structure on real data —
    // an all-zero overlap would mean one of the two rankings is broken
    assert(rows.map(_._2).sum > 0, "truncated ranking shares no neighbors with full")
  }

  test("lpa splits bridged dense clusters that connected components would merge") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two 4-cliques joined by a single bridge (3–10): ONE connected
    // component, but the mode update confines each clique's label
    val cliqueA = Seq((0L,1L),(0L,2L),(0L,3L),(1L,2L),(1L,3L),(2L,3L))
    val cliqueB = Seq((10L,11L),(10L,12L),(10L,13L),(11L,12L),(11L,13L),(12L,13L))
    val und = (cliqueA ++ cliqueB :+ (3L, 10L)).toDF("a", "b")
    val edges = und.select(col("a").as("src"), col("b").as("dst"))
      .union(und.select(col("b").as("src"), col("a").as("dst")))
    val verts = Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L, 13L).toDF("vec_id")
    val labels = SimilarityQueries.lpaPropagate(edges, verts, 3)
      .as[(Long, Long)].collect().toMap
    assert(Seq(0L, 1L, 2L, 3L).map(labels).distinct.length == 1, s"clique A split: $labels")
    assert(Seq(10L, 11L, 12L, 13L).map(labels).distinct.length == 1, s"clique B split: $labels")
    assert(labels(0L) != labels(10L),
      s"LPA must keep the bridged cliques in distinct communities: $labels")
  }

  test("sim_graph_lpa communities partition the corpus") {
    import spark.implicits._
    val got = SimilarityQueries.simGraphLpa(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(got.map(_._2).sum == n, "community sizes must sum to the corpus")
    assert(got.length > 1, "more than one community expected on real data")
    got.foreach { case (_, size, _) => assert(size >= 1) }
  }

  test("sim_index_delete: tombstoned ids never surface, ranks stay dense, masking changed answers") {
    import spark.implicits._
    val got = SimilarityQueries.simIndexDelete(spark, sfDir)
      .as[(Long, Long, Double, Long)].collect()
    assert(got.nonEmpty)
    // the delete predicate: vec_id ≡ 3 (mod 7) must never appear
    got.foreach { case (_, v, _, _) =>
      assert(v % 7 != 3, s"tombstoned vector $v leaked into a top-k") }
    // every query still fills its k slots with live vectors, densely ranked
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length), s"ranks not dense for query $q")
      assert(rows.length == 5, s"query $q returned ${rows.length} of 5 slots")
    }
  }

  test("sim_mmr_diversify: greedy MMR rounds are well-formed and actually diversify") {
    import spark.implicits._
    // (query_id, rank, vec_id, score)
    val got = SimilarityQueries.simMmrDiversify(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    val byQ = got.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to 4L), s"query $q ranks not 1..4")
      assert(rows.map(_._3).distinct.length == 4, s"query $q repeated a pick")
      assert(!rows.map(_._3).contains(q), s"query $q picked itself")
      // from round 2 on, each candidate's penalty is a max over a
      // GROWING selected set, so pick scores are non-increasing. Round
      // 1→2 is excluded: round 1 pins pen=0.0 while a round-2 penalty
      // can be NEGATIVE (an obtuse pair cosine), legitimately raising
      // the score.
      val scores = rows.sortBy(_._2).map(_._4).drop(1)
      scores.zip(scores.tail).foreach { case (a, b) =>
        assert(a >= b - 1e-12, s"query $q MMR scores increased: $a -> $b") }
    }
    // the candidate leg is the PERSISTED INDEX's serve: round 1 (empty
    // selected set, pure relevance argmax) must equal the index-served
    // top-1 on the same slice (same tiebreak)
    val e = SimilarityQueries.embedded(spark, sfDir)
    val cents = SimilarityQueries.ivfCentroids(e)
    val idx = scratchDirOf("sim_ivfmmr")
    val served = SimilarityQueries.ivfServe(spark, e, cents, idx, 0L, 10L)
      .as[(Long, Long, Double, Long)].collect()
    val top1 = served.filter(_._4 == 1L).map(r => r._1 -> r._2).toMap
    byQ.foreach { case (q, rows) =>
      assert(rows.find(_._2 == 1L).get._3 == top1(q),
        s"query $q round-1 pick must equal the index-served relevance top-1") }
    // the penalty must bite somewhere: at least one query's MMR set
    // differs from its plain served top-4 (else the gate is vacuous)
    val top4 = served.filter(_._4 <= 4L).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    assert(byQ.exists { case (q, rows) => rows.map(_._3).toSet != top4(q) },
      "MMR never diverged from plain top-k — diversification is vacuous")
  }

  test("sim_mmr_diversify's candidate frame comes from the pruned index scan") {
    // the relevance leg IS the persisted index's serve (the gate's
    // returned frame is localCheckpoint-truncated, so assert on the
    // candidate frame itself): the scan under the MMR candidate plan
    // must carry the probed-cell cut in PartitionFilters — candidate
    // generation reads nprobe cells per query, never the corpus
    SimilarityQueries.simMmrDiversify(spark, sfDir) // ensures the index exists
    val e = SimilarityQueries.embedded(spark, sfDir)
    val cents = SimilarityQueries.ivfCentroids(e)
    val idx = scratchDirOf("sim_ivfmmr")
    val cand = SimilarityQueries.ivfServe(spark, e, cents, idx, 0L, 10L, k = 10)
    val plan = cand.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(2000))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("cid"), pf)
  }

  test("corpus_d4_select: verdicts partition the corpus; the prototype cut is exactly n/4 of each cluster's survivors") {
    import spark.implicits._
    val rows = SimilarityQueries.corpusD4Select(spark, sfDir)
      .as[(Long, Long, String)].collect()
    val total = SimilarityQueries.embedded(spark, sfDir).count()
    // exactly one verdict per vector, covering the whole corpus
    assert(rows.length.toLong == total, s"${rows.length} verdicts for $total vectors")
    assert(rows.map(_._1).distinct.length == rows.length, "a vector got two verdicts")
    assert(rows.map(_._3).toSet.subsetOf(Set("kept", "dup", "proto")))
    // the dup set matches SemDeDup's pruned set (same clusters, same tau)
    val dupIds = rows.filter(_._3 == "dup").map(_._1).toSet
    val semPruned = SimilarityQueries.simSemanticDedup(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(dupIds == semPruned, "D4's dup stage must equal SemDeDup's pruned set")
    // per cluster: proto count = floor(survivors / 4), survivors = kept + proto
    rows.filter(_._3 != "dup").groupBy(_._2).foreach { case (cid, vs) =>
      val proto = vs.count(_._3 == "proto")
      assert(proto == vs.length / 4,
        s"cluster $cid: $proto prototypes of ${vs.length} survivors")
    }
    // something must actually be dropped at each stage (non-vacuous)
    assert(dupIds.nonEmpty && rows.exists(_._3 == "proto") && rows.exists(_._3 == "kept"))
  }
}
