package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search.
  *
  * Brute-force cosine top-k is the exact baseline: queries are broadcast
  * (they are small by construction), so the big side streams through one
  * codegen'd stage with no shuffle except the final per-query top-k.
  * The dot product is a sequential `aggregate` fold over `zip_with` —
  * deterministic evaluation order, so the DuckDB oracle matches bitwise.
  *
  * The scale path is [[lshBuckets]]: 16 deterministic pseudo-random
  * hyperplanes → 16-bit sign bucket; candidates = bucket equi-join
  * (plus probing neighbor buckets if recall needs it). At 100 TB the
  * bucket join shuffles only (bucket, id, vec) and each bucket is a
  * small local problem — no cross product ever materializes.
  */
object Similarity {

  /** Cast a float embedding column to array<double> (exact). */
  def asDouble(c: Column): Column = c.cast("array<double>")

  /** Rows with a NULL embedding are EXCLUDED from every operator in
    * this object (and the maintained stores built on them): a null
    * vector has no defined norm or similarity, and letting one reach
    * the kernels turns a data-quality problem into an executor NPE.
    * Callers wanting to surface them route the nulls to a quarantine
    * frame before searching. */
  private def nonNullVecs(vecs: DataFrame): DataFrame =
    vecs.filter(col("embedding").isNotNull)

  /** Sequential-fold dot product (deterministic). Reference HOF form —
    * [[graft.functions.GraftFunctions.CosineSimExpr]] is the fast path
    * with identical fold order; specs assert bit-equality. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Fast cosine via the registered Catalyst expression. */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** `dot / (na·nb)` with the fused kernel's zero-norm semantics: a
    * zero denominator yields NaN (Java double division inside the
    * kernel), NOT ANSI's DIVIDE_BY_ZERO error — the norm-hoisted SQL
    * division is guarded so a single zero-norm vector in the corpus
    * cannot fail the whole search under ANSI mode. */
  private[llmops] def normedSim(dot: Column, na: Column, nb: Column): Column = {
    val d = na * nb
    when(d === 0, lit(Double.NaN)).otherwise(dot / d)
  }

  /** Exact top-k neighbors for each query row. */
  /** Exact per-query top-k by (sim desc, cand_id asc) via the BOUNDED
    * aggregate, not a window: `row_number() OVER (PARTITION BY q_id)`
    * sorts a query's ENTIRE candidate set in one task — at corpus
    * scale that is the whole corpus through one reducer per query —
    * where the [[TopK.smallestKCarry]] buffer holds k entries,
    * map-side combines, and ships ≤ k triplets per partition-group.
    * Ordering contract identical to the window form: the sort key is
    * the order-preserving integer image of the NEGATED sim (`+ 0.0`
    * normalizes -0.0 so ties fall through to the id like SQL's
    * comparison would), ties by cand_id ascending, and the OUTPUT sim
    * is the raw carried double — rank-for-rank and bit-for-bit what
    * the oracle's row_number computes. */
  private[llmops] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      // null sims (null/absent embeddings) are EXCLUDED — the bounded
      // aggregate's long key cannot carry them, and "unknown
      // similarity ranks inside the top-k" was never a meaningful
      // answer. NaN sims (zero-norm vectors) rank FIRST, matching both
      // engines' sort semantics (Spark and DuckDB treat NaN as
      // greatest under DESC) — negate() would flip NaN's sign bit and
      // the sortable image would otherwise bury them last.
      .filter(col("sim").isNotNull)
      .withColumn("_skey",
        when(isnan(col("sim")), lit(Long.MinValue))
          .otherwise(call_function("graft_sortable_double",
            negate(col("sim") + lit(0.0)))))
      .groupBy("q_id")
      .agg(TopK.smallestKCarry(k)(col("_skey"), col("cand_id"), col("sim"))
        .as("p"))
      .select(col("q_id"), posexplode(col("p")).as(Seq("i", "r")))
      .select(col("q_id"), (col("i") + 1).cast("int").as("rank"),
        col("r._2").as("cand_id"), col("r._3").as("sim"))

  def bruteForceTopK(queries0: DataFrame, candidates0: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries0.sparkSession)
    val (queries, candidates) = (nonNullVecs(queries0), nonNullVecs(candidates0))
    // per-vector norms precomputed ONCE (|q| + |c| sqrt-dots), not
    // re-derived inside every pair's cosine — at queries × corpus pair
    // volume the two norm folds are 2/3 of the kernel. sqrt(q·q) and
    // sqrt(c·c) are the identical values the fused cosine computes, so
    // sims stay bit-for-bit the oracle's.
    def dotF(a: Column, b: Column) = call_function("graft_dot", a, b)
    val q = queries.select(col("vec_id").as("q_id"),
        asDouble(col("embedding")).as("q_vec"))
      .withColumn("q_nrm", sqrt(dotF(col("q_vec"), col("q_vec"))))
    val c = candidates.select(col("vec_id").as("cand_id"),
        asDouble(col("embedding")).as("c_vec"))
      .withColumn("c_nrm", sqrt(dotF(col("c_vec"), col("c_vec"))))
    rankTopK(c.join(broadcast(q), col("q_id") =!= col("cand_id"))
      .withColumn("sim", normedSim(dotF(col("q_vec"), col("c_vec")),
        col("q_nrm"), col("c_nrm"))), k)
  }

  /** Exact top-k over QUANTIZED embeddings with NO dequantize pass:
    * symmetric per-vector scales cancel out of cosine, so scoring runs
    * exact integer dot products directly on the int8 code arrays
    * (`graft_cosine_q8`). At 100 TB this is the full int8 win — 4× less
    * to read AND an integer hot loop — where dequantize-then-float
    * would pay the storage saving back in compute. */
  def bruteForceTopKQ8(queries0: DataFrame, candidates0: DataFrame, k: Int,
      cacheKey: Option[String] = None): DataFrame = {
    graft.functions.GraftFunctions.register(queries0.sparkSession)
    val (queries, candidates) = (nonNullVecs(queries0), nonNullVecs(candidates0))
    def codes(df: DataFrame, idName: String, vName: String) = df.select(
      col("vec_id").as(idName),
      graft.llmops.Quantize.quantize(asDouble(col("embedding")))
        .getField("q").as(vName))
    val q = codes(queries, "q_id", "q_vec")
    // cacheKey memoizes the CORPUS codes per cache generation: the int8
    // codes are the form the corpus is STORED in at scale — quantization
    // happens at ingest write time, not per query — so a search pays
    // scoring, not re-encoding (the query side re-encodes: queries are
    // per-request data)
    val c = cacheKey match {
      case Some(key) => graft.core.Caching.memoDf(
        queries.sparkSession, key)(codes(candidates, "cand_id", "c_vec"))
      case None => codes(candidates, "cand_id", "c_vec")
    }
    // integer self-dots precomputed per code array (exact in long;
    // their sqrt-product is what the fused q8 cosine derives per pair)
    def nrm(df: DataFrame, v: String) = df.withColumn(s"${v}_nrm",
      sqrt(call_function("graft_dot_q8", col(v), col(v)).cast("double")))
    rankTopK(nrm(c, "c_vec")
      .join(broadcast(nrm(q, "q_vec")), col("q_id") =!= col("cand_id"))
      .withColumn("sim", normedSim(
        call_function("graft_dot_q8", col("q_vec"), col("c_vec"))
          .cast("double"), col("q_vec_nrm"), col("c_vec_nrm"))), k)
  }

  /** Multi-table random-hyperplane LSH: `LshTables` independent tables of
    * `LshBits` sign bits each. For neighbors at cosine θ, one-bit
    * agreement is 1-θ/π; recall ≈ 1-(1-p^bits)^tables — 10×6 gives
    * ≈0.95 for 0.8-similar pairs while candidate sets stay ~bits% of
    * the corpus per query. */
  val LshTables = 10
  val LshBits = 6

  /** Deterministic pseudo-random hyperplane component r(i)(d) ∈ [-0.5, 0.5).
    * Pure arithmetic — identical on any engine. */
  def planeComponent(i: Int, d: Column): Column =
    (((lit(i.toLong * 131L) + d) * 2654435761L) % 1000003L).cast("double") /
      1000003.0 - 0.5

  /** Reference HOF form of the per-table bucket array (spec cross-checks
    * the fast expression against it). Element t = bucket of table t. */
  def lshBucketArrayHof(vec: Column): Column =
    array((0 until LshTables).map { t =>
      (0 until LshBits).map { b =>
        val i = t * LshBits + b
        val proj = aggregate(
          zip_with(vec, sequence(lit(0L), lit(63L)),
            (x, d) => x * planeComponent(i, d)),
          lit(0.0), (acc, v) => acc + v)
        when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)

  /** Fast path: tight-loop Catalyst expression, array<long> of buckets. */
  def lshBucketArray(vec: Column): Column =
    call_function("graft_lsh_buckets", vec)

  /** IVF (inverted-file) ANN — the second scale path beside LSH.
    *
    * Training: k-means with deterministic farthest-point seeding
    * ([[farthestPointSeeds]]) and `iters` Lloyd iterations; the
    * element-wise centroid mean is a distributed
    * `posexplode → groupBy(cid, pos)` aggregation (scales to any
    * corpus; only k×dim numbers ever reach the driver). Assignment is
    * a NARROW pass: centroids travel as a broadcast literal into
    * [[graft.functions.GraftFunctions.NearestCentroidsExpr]], so the
    * corpus never shuffles for list building. Search probes the
    * `nprobe` nearest lists per query and exact-cosine re-ranks inside
    * them — candidate volume ≈ nprobe/k of the corpus. nprobe/k = 1/2
    * here is a TEST-GEOMETRY artifact: the synthetic embeddings are
    * near-isotropic (little cluster structure) and k is held at 16 so
    * the oracle-scale corpora populate every list; a production index
    * sizes k ~ √n, where the same recall target needs nprobe ≪ k.
    */
  val IvfCentroids = 16
  val IvfProbes = 8
  val IvfIters = 2

  /** Deterministic k-means++-style seeding: greedy FARTHEST-POINT
    * traversal. Seed 1 is the id-smallest vector; each next seed is the
    * vector farthest (under the assignment metric) from its nearest
    * already-chosen seed, ties broken by vec_id. This is the
    * derandomized D² init — max/min are order-independent even over
    * floats (unlike sums), so the seeds are engine-exact and
    * run-stable, and spread seeds across the data's extremes instead of
    * whatever every `stride`-th id happens to hit (measured recall@5:
    * 0.54-0.60 under stride seeding + nprobe 4 → 0.78-0.92 under
    * farthest-point + nprobe 8). Cost: k TakeOrdered corpus passes at
    * TRAIN time only — at larger k switch to k-means|| oversampling
    * (Bahmani et al., VLDB 2012), which replaces the k passes with
    * O(log n) rounds. */
  private def farthestPointSeeds(vecs: DataFrame, k: Int,
      assignFn: String): Array[Array[Double]] = {
    // k sequential passes over the SAME projection: materialize it once
    // (narrow (id, vec) rows) so each pass scans executor-local blocks
    // instead of re-reading + re-casting the source (measured: halves
    // llm_sim_ivf's training share at sf0.1)
    val snap = vecs.select(col("vec_id"),
      asDouble(col("embedding")).as("embedding")).localCheckpoint()
    val first = snap.orderBy("vec_id").limit(1)
      .select(col("embedding").as("e"))
      .collect().map(_.getSeq[Double](0).toArray)
    if (first.isEmpty) return Array.empty
    val seeds = scala.collection.mutable.ArrayBuffer(first.head)
    while (seeds.size < k) {
      val seedLit = typedLit(seeds.map(_.toSeq).toSeq)
      val e = col("embedding")
      val nearest = element_at(seedLit,
        element_at(call_function(assignFn, e, seedLit, lit(1)), 1) + 1)
      // proximity to the nearest seed: cosine sim for the cosine
      // metric, negated squared L2 for the Euclidean one — ascending
      // order puts the FARTHEST vector first in both cases
      val prox =
        if (assignFn == "graft_nearest_centroids")
          call_function("graft_cosine", e, nearest)
        else
          -aggregate(zip_with(e, nearest, (x, c) => (x - c) * (x - c)),
            lit(0.0), (acc, v) => acc + v)
      val next = snap
        .select(e.as("e"), prox.as("prox"), col("vec_id"))
        .orderBy(col("prox").asc, col("vec_id").asc).limit(1)
        .collect()
      seeds += next.head.getSeq[Double](0).toArray
    }
    seeds.toArray
  }

  /** Train centroids; returns k rows of `Array[Double]` (dense means).
    * `assignFn` picks the assignment metric: cosine
    * (`graft_nearest_centroids`, the IVF default) or Euclidean
    * (`graft_nearest_centroids_l2`, what PQ codebooks need).
    * `farthestSeeding` toggles the init: farthest-point for the
    * direction-clustered IVF lists (where it lifted recall@5 by ~0.25);
    * every-`stride`-th-id for PQ CODEBOOKS, whose 4-dim near-uniform
    * subspaces want density-proportional seeds — farthest-point chases
    * the subspace corners there and measurably DROPPED PQ recall below
    * its 0.55 floor at sf0.1. */
  def kmeansCentroids(vecs0: DataFrame, k: Int = IvfCentroids,
      iters: Int = IvfIters,
      assignFn: String = "graft_nearest_centroids",
      farthestSeeding: Boolean = true): Array[Array[Double]] = {
    val vecs = nonNullVecs(vecs0)
    val spark = vecs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    var cents: Array[Array[Double]] =
      if (farthestSeeding) farthestPointSeeds(vecs, k, assignFn)
      else {
        val n = vecs.count()
        val stride = math.max(1L, n / k)
        vecs.filter(col("vec_id") % stride === 0)
          .orderBy("vec_id").limit(k)
          .select(asDouble(col("embedding")).as("e"))
          .collect().map(_.getSeq[Double](0).toArray)
      }
    var it = 0
    while (it < iters) {
      val centLit = typedLit(cents.map(_.toSeq).toSeq)
      val assigned = vecs.select(
        element_at(call_function(assignFn,
          asDouble(col("embedding")), centLit, lit(1)), 1).as("cid"),
        asDouble(col("embedding")).as("e"))
      val means = assigned
        .select(col("cid"), posexplode(col("e")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg("x").as("m"))
        .groupBy("cid").agg(map_from_entries(
          collect_list(struct(col("pos"), col("m")))).as("byPos"))
        .collect()
      val updated = cents.clone()
      means.foreach { row =>
        val cid = row.getInt(0)
        val byPos = row.getMap[Int, Double](1)
        updated(cid) = Array.tabulate(cents(cid).length)(i =>
          byPos.getOrElse(i, cents(cid)(i)))
      }
      cents = updated
      it += 1
    }
    cents
  }

  /** IVF ANN search: assign corpus to lists (narrow), probe nprobe
    * lists per query, exact re-rank. */
  def ivfTopK(queries0: DataFrame, candidates0: DataFrame, k: Int,
      nCentroids: Int = IvfCentroids, nprobe: Int = IvfProbes,
      cacheKey: Option[String] = None): DataFrame = {
    val (queries, candidates) = (nonNullVecs(queries0), nonNullVecs(candidates0))
    val spark = queries.sparkSession
    graft.functions.GraftFunctions.register(spark)
    // cacheKey (e.g. the corpus path) reuses the trained centroids
    // across searches over the same immutable corpus — the
    // serving-index lifecycle (pqTopK's codebook contract); a per-query
    // k-means retrain is the one-shot/ad-hoc path
    // the cache key carries nCentroids: the caller's key names the
    // corpus, and two searches over it with different list counts must
    // not silently share one centroid set (the ConcurrentHashMap has
    // no invalidate hook — it models immutable-corpus serving indexes)
    val cents = cacheKey match {
      case Some(key) =>
        centCache.computeIfAbsent(s"$key#n=$nCentroids", _ =>
          kmeansCentroids(candidates, nCentroids))
      case None => kmeansCentroids(candidates, nCentroids)
    }
    val centLit = typedLit(cents.map(_.toSeq).toSeq)
    // norms precomputed per vector, not per probed pair (see
    // bruteForceTopK — identical values, 1/3 the kernel work)
    def dotF(a: Column, b: Column) = call_function("graft_dot", a, b)
    val c = candidates.select(col("vec_id").as("cand_id"),
        asDouble(col("embedding")).as("c_vec"))
      .withColumn("c_nrm", sqrt(dotF(col("c_vec"), col("c_vec"))))
      .withColumn("cid", element_at(call_function("graft_nearest_centroids",
        col("c_vec"), centLit, lit(1)), 1))
    val q = queries.select(col("vec_id").as("q_id"),
        asDouble(col("embedding")).as("q_vec"))
      .withColumn("q_nrm", sqrt(dotF(col("q_vec"), col("q_vec"))))
    val probes = q.select(col("q_id"), col("q_vec"), col("q_nrm"),
      explode(call_function("graft_nearest_centroids",
        col("q_vec"), centLit, lit(nprobe))).as("cid"))
    rankTopK(probes.join(c, Seq("cid"))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("sim", normedSim(dotF(col("q_vec"), col("c_vec")),
        col("q_nrm"), col("c_nrm"))), k)
  }

  /** Product quantization (PQ) — the STORAGE-scale ANN path beside LSH
    * and IVF: 64-dim float vectors compress to [[PqSubspaces]] codebook
    * ids of 4 bits each (here kept as an int array; a production table
    * packs them into 4 bytes — 64× under float32, 16× under int8),
    * and approximate scoring reads ONLY the codes. Per-subspace
    * codebooks of [[PqCodebookK]] centroids train with the same
    * deterministic distributed Lloyd procedure as IVF but under
    * EUCLIDEAN assignment (sub-vector magnitude is signal; cosine
    * assignment would discard it). Search is asymmetric-distance
    * (ADC): approx dot(q, c) = Σ_m dot(q_sub_m, codebook_m[code_m]),
    * candidate norms precomputed per code — at query time the raw
    * corpus vectors are touched only to exact-re-rank the top
    * rerank·k approximate hits per query. */
  val PqSubspaces = 8
  val PqSubDim = 8
  val PqCodebookK = 16
  val PqRerank = 16
  val PqIters = 4

  /** Per-subspace codebooks (m × k × subdim), L2-assigned Lloyd. The m
    * trainings are INDEPENDENT subproblems — they run as concurrent
    * Spark jobs (scheduler interleaves their stages), so wall-clock is
    * ~one training, not m of them. */
  def pqCodebooks(candidates: DataFrame, m: Int = PqSubspaces,
      k: Int = PqCodebookK, iters: Int = PqIters): Array[Array[Array[Double]]] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val futs = (0 until m).map { mi =>
      Future {
        kmeansCentroids(
          candidates.select(col("vec_id"),
            slice(asDouble(col("embedding")), mi * PqSubDim + 1, PqSubDim)
              .as("embedding")),
          k, iters, assignFn = "graft_nearest_centroids_l2",
          farthestSeeding = false)
      }
    }
    futs.map(Await.result(_, Duration.Inf)).toArray
  }

  /** Encode a double vector into its per-subspace code array — a NARROW
    * pass: codebooks travel as broadcast literals, no join, no shuffle. */
  def pqEncode(v: Column, books: Array[Array[Array[Double]]]): Column =
    array(books.indices.map { mi =>
      element_at(call_function("graft_nearest_centroids_l2",
        slice(v, mi * PqSubDim + 1, PqSubDim),
        typedLit(books(mi).map(_.toSeq).toSeq), lit(1)), 1)
    }: _*)

  /** ADC approximate dot product of a raw query against a code array.
    * (At production scale the per-query LUT of m×k sub-dots is staged
    * once; here the sub-dot folds are the same arithmetic inline.) */
  def pqApproxDot(qv: Column, codes: Column,
      books: Array[Array[Array[Double]]]): Column =
    books.indices.map { mi =>
      dot(slice(qv, mi * PqSubDim + 1, PqSubDim),
        element_at(typedLit(books(mi).map(_.toSeq).toSeq),
          element_at(codes, mi + 1) + 1))
    }.reduce(_ + _)

  // trained codebooks per cache key — a production index persists its
  // codebooks beside the codes; re-deriving them per search would be
  // like re-training an index per query
  private val bookCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Double]]]]()

  // IVF centroid sets per cache key (same persistence rationale)
  private val centCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  /** SemDeDup-style cluster-scoped near-duplicate pairs (Abbas et al.,
    * "SemDeDup", 2023 — public method): assign each vector to its IVF
    * cluster (narrow broadcast-literal pass), then scan pairs ONLY
    * within a cluster at exact cosine ≥ `tau`. The published trade:
    * cross-cluster pairs are not considered BY DESIGN, turning the n²
    * corpus scan into k local n/k-sized problems — each cluster cell is
    * a shuffle-hash join on `cid`, no corpus broadcast, no global cross
    * product. Every emitted pair carries its EXACT cosine (the
    * approximation is only in which pairs are considered, never in the
    * scores). */
  def semDedupPairs(vecs0: DataFrame, tau: Double,
      nCentroids: Int = IvfCentroids, probes: Int = 3,
      cacheKey: Option[String] = None): DataFrame = {
    val vecs = nonNullVecs(vecs0)
    val spark = vecs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val cents = cacheKey match {
      case Some(k) =>
        // nCentroids in the key — see ivfTopK's cache note
        centCache.computeIfAbsent(s"$k#n=$nCentroids",
          _ => kmeansCentroids(vecs, nCentroids))
      case None => kmeansCentroids(vecs, nCentroids)
    }
    val centLit = typedLit(cents.map(_.toSeq).toSeq)
    // MULTI-ASSIGNMENT (probes > 1): each vector joins the scan of its
    // `probes` nearest clusters — the standard recall fix for pairs
    // straddling a cluster boundary; compute stays ~probes²·n²/k per
    // corpus, never n²
    val c = vecs.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .select(col("vec_id"), col("e"),
        explode(call_function("graft_nearest_centroids",
          col("e"), centLit, lit(probes))).as("cid"))
    val a = c.select(col("cid"), col("vec_id").as("keep_id"),
      col("e").as("ea"))
    val b = c.select(col("cid"), col("vec_id").as("dup_id"),
      col("e").as("eb"))
    a.hint("shuffle_hash").join(b, Seq("cid"))
      .filter(col("keep_id") < col("dup_id"))
      // score BEFORE deduplicating the multi-probe collisions: the
      // cosine is deterministic per pair, so re-scoring a pair that
      // shares several probed clusters is idempotent — and the
      // dropDuplicates exchange then carries only (ids, sim) for the
      // τ-survivors instead of BOTH embedding arrays for every
      // candidate pair (the candidate×vector-bytes shuffle was the
      // scale hazard of this plan)
      .withColumn("sim", cosine(col("ea"), col("eb")))
      .filter(col("sim") >= tau)
      .select("dup_id", "keep_id", "sim")
      .dropDuplicates("dup_id", "keep_id")
  }

  /** PQ ANN search: encode corpus (narrow), ADC-score codes against
    * broadcast queries, exact-cosine re-rank the top rerank·k.
    * `cacheKey` (e.g. the corpus path) reuses trained codebooks across
    * searches over the same immutable corpus. */
  def pqTopK(queries0: DataFrame, candidates0: DataFrame, k: Int,
      rerank: Int = PqRerank, cacheKey: Option[String] = None): DataFrame = {
    val (queries, candidates) = (nonNullVecs(queries0), nonNullVecs(candidates0))
    val spark = queries.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val books = cacheKey match {
      case Some(key) =>
        bookCache.computeIfAbsent(key, _ => pqCodebooks(candidates))
      case None => pqCodebooks(candidates)
    }
    // per-code squared norms, precomputed driver-side (m × k doubles)
    val norms = books.map(_.map(c => c.map(x => x * x).sum))
    val enc = candidates.select(col("vec_id").as("cand_id"),
        pqEncode(asDouble(col("embedding")), books).as("codes"))
      .withColumn("cnorm2", books.indices.map(mi =>
          element_at(typedLit(norms(mi).toSeq),
            element_at(col("codes"), mi + 1) + 1))
        .reduce(_ + _))
    def dotF(a: Column, b: Column) = call_function("graft_dot", a, b)
    val q = queries.select(col("vec_id").as("q_id"),
        asDouble(col("embedding")).as("q_vec"))
      .withColumn("q_nrm", sqrt(dotF(col("q_vec"), col("q_vec"))))
    // ADC shortlist via the bounded top-k aggregate — the ADC pass
    // scores EVERY code per query, and a row_number window would
    // funnel each query's whole corpus through one sort task (the same
    // hazard rankTopK removes from the exact rankers); norms hoisted
    // per vector, not per pair
    val approx = enc
      .withColumn("c_anrm", sqrt(greatest(col("cnorm2"), lit(1e-12))))
      .join(broadcast(q), col("q_id") =!= col("cand_id"))
      .withColumn("asim", normedSim(
        pqApproxDot(col("q_vec"), col("codes"), books),
        col("q_nrm"), col("c_anrm")))
      .withColumn("_skey", call_function("graft_sortable_double",
        negate(col("asim") + lit(0.0))))
      .groupBy("q_id")
      .agg(TopK.smallestKCarry(rerank * k)(col("_skey"), col("cand_id"),
        col("asim")).as("p"))
      .select(col("q_id"), explode(col("p")).as("r"))
      .select(col("q_id"), col("r._2").as("cand_id"))
    val cvec = candidates.select(col("vec_id").as("cand_id"),
        asDouble(col("embedding")).as("c_vec"))
      .withColumn("c_nrm", sqrt(dotF(col("c_vec"), col("c_vec"))))
    rankTopK(approx.join(cvec, "cand_id").join(broadcast(q), "q_id")
      .withColumn("sim", normedSim(dotF(col("q_vec"), col("c_vec")),
        col("q_nrm"), col("c_nrm"))), k)
  }

  /** Self-join collision pairs for LSH-screened dedup: all (keep_id <
    * dup_id) vector pairs landing in the same bucket of ≥1 table.
    * Input: (vec_id, e) with e = array<double>. At 100 TB only
    * (vec_id, table, bucket) triples shuffle for the equi-join; each
    * (table, bucket) cell is a small local pair problem — the corpus
    * vectors themselves never re-partition here. */
  def lshCollisionPairs(vecs: DataFrame,
      maxCell: Int = SkewGuard.MaxCellSize): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    // materialize bucket arrays before exploding (Generate re-evaluates
    // computed expressions per output row — see lshTopK). persist(), not
    // localCheckpoint: checkpoint blocks are non-recomputable, so an
    // executor loss mid-join would fail the job at exactly the scale
    // where churn is routine; the cache entry is deduped by plan (same
    // input → same entry) and released by clearCache/session end.
    val arr = vecs.select(col("vec_id"), lshBucketArray(col("e")).as("tbs"))
      .persist()
    arr.count()
    val tb = arr.select(col("vec_id"), posexplode(col("tbs")).as(Seq("t", "b")))
    // per-(table, bucket) size guard: a degenerate bucket (mass-duplicated
    // vector, the all-zeros region) emits a star instead of a k² cell —
    // see SkewGuard for the contract and recall effect
    SkewGuard.cellPairs(tb, Seq("t", "b"), "vec_id", maxCell)
      .select(col("a_id").as("keep_id"), col("b_id").as("dup_id"))
      .distinct()
  }

  /** Approximate NN: candidates = any-table bucket collision (equi-join
    * on (table, bucket) — at 100 TB this shuffles only (id, bucket) pairs
    * and each bucket is a small local problem), exact cosine re-rank. */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      maxCell: Int = SkewGuard.MaxCellSize): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    def dotF(a: Column, b: Column) = call_function("graft_dot", a, b)
    val q = queries.select(col("vec_id").as("q_id"),
        asDouble(col("embedding")).as("q_vec"))
      .withColumn("q_nrm", sqrt(dotF(col("q_vec"), col("q_vec"))))
    val c = candidates.select(col("vec_id").as("cand_id"),
        asDouble(col("embedding")).as("c_vec"))
      .withColumn("c_nrm", sqrt(dotF(col("c_vec"), col("c_vec"))))
    // Materialize bucket arrays before exploding — Generate over a
    // computed expression re-evaluates it per output row (see
    // LlmQueries.gramHashes); over a cached array it's linear.
    val cbArr = c.select(col("cand_id"), lshBucketArray(col("c_vec")).as("tbs"))
      .persist()
    cbArr.count()
    val qb = q.select(col("q_id"),
      posexplode(lshBucketArray(col("q_vec"))).as(Seq("t", "b")))
    // per-(table, bucket) candidate cap: an oversized bucket keeps its
    // `maxCell` smallest-id members (the row_number-by-id semantics,
    // via the BOUNDED aggregate — a window would sort whole cells in
    // single tasks, and cells are exactly where the skew lives). For
    // top-k search a bucket that big is mass duplication or a
    // collapsed region — the kept members are interchangeable
    // candidates for any query probing it, so recall@k is unaffected
    // in the degenerate case the cap exists for; a diverse 1024+ cell
    // would lose tail candidates, the same trade SkewGuard.cellPairs
    // documents.
    val cb = cbArr.select(col("cand_id"),
        posexplode(col("tbs")).as(Seq("t", "b")))
      .groupBy("t", "b")
      .agg(TopK.smallestK(maxCell)(col("cand_id"), col("cand_id")).as("p"))
      .select(col("t"), col("b"), explode(transform(
        sequence(lit(1), (size(col("p")) / lit(2)).cast("int")),
        i => element_at(col("p"), i * 2))).as("cand_id"))
    val pairs = qb.join(cb, Seq("t", "b"))
      .filter(col("q_id") =!= col("cand_id"))
      .select("q_id", "cand_id").distinct()
    rankTopK(pairs
      .join(broadcast(q), "q_id")
      .join(c, "cand_id")
      .withColumn("sim", normedSim(dotF(col("q_vec"), col("c_vec")),
        col("q_nrm"), col("c_nrm"))), k)
  }
}
