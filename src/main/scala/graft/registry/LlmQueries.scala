package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Caching, Tables}
import graft.llmops.{BloomDedup, MinHash, Multimodal, SimHash, Similarity, Text}

/** LLM-training-data pipeline operators (BASELINE.json north star):
  * deduplication (exact / MinHash+LSH / SimHash / n-gram Jaccard),
  * similarity search (brute-force + LSH), text analysis (lang-id,
  * quality, tokens, fingerprint), multimodal plumbing.
  *
  * Design rule: every deterministic operator is expressed so the DuckDB
  * oracle reproduces it bit-for-bit — including the custom MinHash /
  * SimHash aggregates (their permutation arithmetic lives inside the
  * SQL-expressible field mod 2^31-1).
  */
object LlmQueries {
  import QueryDef.{rowsOnly, sql}

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)


  /** Codegen'd two-pointer intersection count over the sorted `gs`
    * sets — the verify-stage replacement for
    * `size(array_intersect(...))`, which builds a hash set and an
    * output array per candidate pair just to take its size. */
  private[registry] def icount(s: SparkSession, a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(s)
    call_function("graft_sorted_icount", a, b)
  }

  /** Document-frequency cap for n-gram candidate generation: grams seen in
    * more than this many documents are too common to identify a near-dup
    * pair and would contribute df² rows to the postings self-join. When
    * any gram exceeds the cap, candidate generation runs on the CAPPED
    * gram sets (cap applied before the prefix slice — see
    * [[ngramCandidates]]), so recall is exact for capped-set Jaccard
    * ≥ 0.5: only pairs whose similarity rests on corpus-boilerplate
    * grams can be missed. Surviving pairs are always exact-verified on
    * their FULL gram sets. */
  val NgramDfCap = 2048L

  /** Shared oracle CTE prefix: tokens → distinct 3-gram shingles → 60-bit
    * hashes in [0, 2^31-1). */
  private[registry] val ShingleCtes =
    """toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
      |     for i in range(1, len(tk) - 1)])) AS gram
      |  FROM toks
      |), gh AS (
      |  SELECT doc_id, gram,
      |         CAST(('0x' || substring(md5(gram), 1, 15)) AS BIGINT)
      |           % 2147483647 AS g
      |  FROM grams
      |)"""

  /** Spark twin of ShingleCtes: (doc_id, gram, g).
    *
    * PERF: the shingle arrays are persisted (one small row per doc) and
    * eagerly built BEFORE the explode. `Generate(explode(<HOF expr>))`
    * re-evaluates the higher-order shingle expression per OUTPUT row
    * (measured 22 s vs 0.4 s at sf0.1); exploding a materialized array
    * column is linear. The cache is tiny (docs × gram array) and shared
    * across the minhash/simhash/ngram queries (same logical plan →
    * same cache entry). */
  private def gramHashes(s: SparkSession, d: String): DataFrame = {
    // The documents table is a single small parquet file at bench SFs —
    // ONE input split — so without an explicit spread the whole
    // tokenize→shingle→md5 pipeline (the dominant cost of the entire
    // dedup/profile family) runs on one core while the oracle engine
    // parallelizes. Hash-repartition on doc_id to session width BEFORE
    // the heavy per-row work: the 600 KB text shuffle is noise, the
    // downstream win is structural — every doc_id-keyed aggregation
    // (docGramStats' fused pass, contamination's eval grouping) REUSES
    // hashpartitioning(doc_id) and drops its own exchange. At 100 TB the
    // table arrives in thousands of splits and the repartition is a
    // cheap width normalizer.
    // CASCADED guards: the token arrays are their own cache layer,
    // touched on every call, so each cache generation re-erects the
    // persist boundary between tokenize and the downstream HOFs —
    // without it CollapseProject would inline the tokenize split into
    // every element_at of the shingle transform (the chained-HOF
    // blowup; measured 20 s vs 1 s at sf0.1). Deriving shingles from
    // the CACHED tk attribute removes that hazard structurally.
    val toks = tokenArrays(s, d)
    // FUSED shingle+hash kernel (r13): the HOF chain built shingle
    // STRING arrays (three interpreted element_ats + a concat_ws per
    // shingle), cached them, then re-projected a hash per exploded
    // string; the kernel emits the distinct shingles' hash60s in one
    // pass and the cache holds long arrays instead of strings —
    // multiset/order identical (ShingleHashSpec fuzzes it against the
    // HOF chain)
    val arrays = Caching.memoDf(s, s"gramArrays:$d") {
      toks.select(col("doc_id"), Text.shingleHashes(col("tk")).as("grams"))
    }
    Caching.memoDf(s, s"gramHashes:$d") {
      arrays.select(col("doc_id"), explode(col("grams")).as("g"))
    }
  }

  /** Per-doc whitespace token arrays — ONE tokenize pass over the
    * corpus serving every token-level consumer (the shingle/gram
    * family here, the tf-idf term aggregation in CurationQueries).
    * Empty/whitespace-only docs are excluded: they tokenize to [""],
    * which the gram path drops at the shingle explode anyway and the
    * term path must never count. Spread across the session width
    * BEFORE the per-row work (single-split table at bench SFs; cheap
    * width normalizer at scale), and hashpartitioning(doc_id) is then
    * reused by every doc-keyed aggregation downstream. */
  private[registry] def tokenArrays(s: SparkSession, d: String): DataFrame =
    Caching.memoDf(s, s"tokenArrays:$d", eager = true) {
      val width = graft.core.GraftSession.shuffleWidth(s)
      // the narrow metadata columns ride the cache (~6% of its bytes
      // next to the token arrays): language-gated consumers (the bigram
      // LM, DSIR, fertility, the funnel's meta frame) previously each
      // re-joined the documents parquet per cache generation just to
      // recover lang/source/n_chars
      t(s, d, "documents")
        .filter(length(trim(col("text"))) > 0)
        .repartition(width, col("doc_id"))
        // n_text_len / n_nonalnum (two longs, computed in the same
        // single scan): the classifier family's label heuristic needs
        // them, and carrying them here lets qualityTrainFrame derive
        // its labels ROW-WISE off this cache instead of paying a
        // second documents scan + tokenize + join per training
        // (guide §1.2 step 1 — don't recompute what one pass already
        // produced)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          length(col("text")).as("n_text_len"),
          Text.nonAlnumCount(col("text")).cast("long").as("n_nonalnum"),
          Text.tokens(col("text")).as("tk"))
    }

  /** Per-doc gram-set stats in ONE aggregation pass straight off the
    * gram-hash rows — the dedup that the oracle writes as DISTINCT
    * happens inside `collect_set`, and the MinHash fold is
    * duplicate-insensitive, so no separate distinct exchange exists at
    * all: sorted gram-hash set, cardinality, and the 64-slot signature
    * come out of ONE shuffle on doc_id. ~docs × (set + 64) longs —
    * small relative to the corpus but NOT broadcast: the verify joins
    * hint `shuffle_hash` with the (far smaller) candidate side as the
    * build, keeping memory bounded while skipping the sort. At 100 TB
    * the equivalent is a bucketed side table; the pair-verify stays a
    * hash-probe + array_intersect either way. */
  private[registry] def docGramStats(s: SparkSession, d: String): DataFrame = {
    // gram hashes are < 2^31-1 by construction → the per-doc sets store
    // as array<int>, HALVING the bytes of the cache and of every verify
    // join that ships gram sets across an exchange (sort order and
    // array_intersect semantics are unchanged for non-negative values;
    // consumers needing BIGINT cast back at the projection)
    // dependency access OUTSIDE the memo build: every call touches the
    // gram-cache guards in dependency order, so a cleared cache is
    // re-persisted bottom-up before this layer's materializing count
    val gh = gramHashes(s, d)
    Caching.memoDf(s, s"docGramStats:$d", eager = true) {
      gh.groupBy("doc_id")
        .agg(sort_array(collect_set(col("g").cast("int"))).as("gs"),
          MinHash.minhash(col("g")).as("sig"))
        .withColumn("n", size(col("gs")).cast("long"))
    }
  }

  /** Distinct (doc_id, g) rows for pair generation — a NARROW explode of
    * the cached per-doc sets (no distinct exchange; the set was already
    * deduped inside docGramStats' aggregation). */
  private[registry] def gramSetRows(s: SparkSession, d: String): DataFrame =
    docGramStats(s, d).select(col("doc_id"), explode(col("gs")).as("g"))

  /** The corpus eval-holdout convention shared by the contamination
    * check and (via [[gramDfFlags]]) the dedup family's cache identity:
    * every 50th doc is held out. */
  private[registry] val isEvalDoc: Column = col("doc_id") % 50 === 0

  /** Per-gram vocabulary table `(g, df, in_train, in_eval)` — ONE
    * map-side-combined shuffle on the gram hash serving every consumer
    * that needs gram-level corpus statistics: the viral-gram df cap
    * (`df > NgramDfCap`, llm_dedup_ngram_jaccard) and the contamination
    * train/eval presence flags (llm_contamination). Vocabulary-sized
    * (distinct grams ≪ postings), persisted once per (session, dir):
    * whichever query runs first materializes it and the others pay a
    * cached filter instead of their own corpus-wide aggregation. */
  private[registry] def gramDfFlags(s: SparkSession, d: String): DataFrame = {
    val rows = gramSetRows(s, d)
    Caching.memoDf(s, s"gramDfFlags:$d") {
      rows.groupBy("g").agg(
        count(lit(1)).as("df"),
        max(when(!isEvalDoc, 1).otherwise(0)).as("in_train"),
        max(when(isEvalDoc, 1).otherwise(0)).as("in_eval"))
    }
  }

  /** Candidate pairs for exact Jaccard ≥ 0.5 over per-doc SORTED gram
    * sets `(doc_id, gs, n)` — AllPairs/PPJoin, fully distributed.
    *
    * PREFIX FILTER: under any global gram order, two sets with
    * J ≥ 0.5 overlap in ≥ ⌈n/2⌉ elements, so their first ⌊n/2⌋+1
    * elements under that order must intersect — indexing only that
    * prefix is lossless for candidate generation. The gram sets arrive
    * already sorted by the global hash order, so the prefix is a
    * zero-shuffle slice (the postings self-join drops from Σ_g df² pair
    * rows to prefix collisions only: 15.0M → 0.6M on the sf0.1 corpus).
    *
    * Then PPJoin-style pruning BEFORE any gram-set fetch:
    * (a) length filter inside the join — J ≥ 0.5 forces
    *     max(na,nb) ≤ 2·min(na,nb);
    * (b) positional filter — sets sorted by one global order share
    *     their common elements in the same relative order, so the
    *     EARLIEST colliding gram (min pos on both sides, attained by
    *     the same gram) bounds the total overlap:
    *     I ≤ min(na − ia, nb − jb); J ≥ 0.5 needs 3·I ≥ na + nb.
    * Both are exact — no qualifying pair is pruned
    * (`NgramCandidateSpec` property-checks superset-ness against a
    * brute-force evaluation on randomized sets, with and without caps).
    *
    * DF-CAP SEMANTICS: when `viral` (grams in > NgramDfCap docs) is
    * non-empty, the capped grams are removed from each doc's set
    * BEFORE the prefix slice, and the length/positional bounds run on
    * the CAPPED sizes — the theorems then hold exactly w.r.t. the
    * capped sets, so candidate recall is exact for capped-set Jaccard
    * ≥ 0.5. Corpus-boilerplate grams thus do not count toward finding
    * a pair (the standard stopword-removal contract); the verified
    * jaccard is still computed on the FULL sets. The cap-rebuild path
    * costs one extra shuffle and runs ONLY when a viral gram actually
    * exists (one tiny driver check) — with no viral grams the slice is
    * the zero-shuffle cached-stats path. */
  private[registry] def ngramCandidates(stats: DataFrame, viral: DataFrame,
      df2: Option[DataFrame] = None): DataFrame = {
    // the probe pays the (map-side-combined) df aggregation once;
    // persisting first means the anti-join below REUSES that result
    // instead of recomputing the aggregation inside broadcast()
    val hasViral = !Caching.persistOnce(viral).isEmpty
    val base =
      if (!hasViral) stats.select(col("doc_id"), col("gs"), col("n"))
      else cappedGramStats(stats, viral)
    ngramPrefixJoin(base, df2)
  }

  /** Per-doc sets with viral grams removed: `(doc_id, gs, n)` over the
    * CAPPED sets. Docs whose every gram is viral emit no row (an empty
    * capped set can never satisfy capped-Jaccard ≥ 0.5). */
  private def cappedGramStats(stats: DataFrame, viral: DataFrame): DataFrame =
    stats.select(col("doc_id"), explode(col("gs")).as("g"))
      .join(broadcast(viral), Seq("g"), "left_anti")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("g"))).as("gs"))
      .withColumn("n", size(col("gs")).cast("long"))

  /** AllPairs/PPJoin prefix+length+positional candidate join over
    * per-doc sorted sets `(doc_id, gs, n)`.
    *
    * Exchange discipline (the shape that matters at 100 TB as much as
    * on the bench): the prefix postings are hash-repartitioned on the
    * gram ONCE and persisted, so (a) the optional `df2` semi-join (see
    * below) and (b) BOTH sides of the self-join read the same
    * co-partitioned cache — the self-join plans with ZERO additional
    * exchange. The collision rows are then repartitioned on `a_id`
    * alone: `hashpartitioning(a_id)` satisfies the (a_id, b_id)
    * aggregation's clustered-distribution requirement AND is exactly
    * what the verify join on `a_id` needs, so the pair aggregation and
    * the first verify join both run exchange-free.
    *
    * `df2`, when given, is the grams with corpus document-frequency
    * ≥ 2 (a narrow slice of the cached [[gramDfFlags]] vocabulary,
    * already hash(g)-partitioned): a gram in exactly one document can
    * never produce a collision, and on natural corpora MOST grams are
    * df=1, so the colocated semi-join drops the bulk of the postings
    * before the self-join pays for them. Valid for the capped path
    * too: removing viral grams does not change any other gram's df.
    *
    * TWO exact positional bounds prune before any gram-set fetch.
    * Sets sorted by one global order share their common elements in
    * the same relative order; let cnt be the number of observed prefix
    * collisions, (ia/jb)_min/max the first/last collision positions —
    * min and max are each attained by the same gram on both sides, so:
    *   (1) every common gram sorts ≥ the first collision:
    *       I ≤ min(na − ia_min, nb − jb_min);
    *   (2) every common gram ≤ the LAST collision g* lies in both
    *       prefixes (its positions are ≤ the maxima, which are inside
    *       the prefixes) and is therefore itself an observed
    *       collision; the rest sort strictly after g* on BOTH sides:
    *       I ≤ cnt + min(na − 1 − ia_max, nb − 1 − jb_max).
    * J ≥ 0.5 needs 3·I ≥ na + nb against BOTH upper bounds. Both are
    * exact — no qualifying pair is pruned (`NgramCandidateSpec`
    * property-checks superset-ness against brute force). */
  private def ngramPrefixJoin(base: DataFrame,
      df2: Option[DataFrame] = None): DataFrame = {
    val w = graft.core.GraftSession.shuffleWidth(base.sparkSession)
    val raw = base.select(col("doc_id"), col("n"),
        posexplode(slice(col("gs"), lit(1),
          (size(col("gs")) / 2).cast("int") + 1)).as(Seq("pos", "g")))
      .repartition(w, col("g"))
    val prefixes = Caching.persistOnce(
      df2.fold(raw)(f => raw.join(f, Seq("g"), "left_semi")))
    prefixes.as("x").hint("shuffle_hash").join(prefixes.as("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id") &&
          col("x.n") <= lit(2) * col("y.n") &&
          col("y.n") <= lit(2) * col("x.n"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.pos").as("xp"), col("y.pos").as("yp"),
        col("x.n").as("xn"), col("y.n").as("yn"))
      .repartition(w, col("a_id"))
      .groupBy("a_id", "b_id")
      .agg(min(col("xp")).as("ia"), min(col("yp")).as("jb"),
        max(col("xp")).as("ia_max"), max(col("yp")).as("jb_max"),
        count(lit(1)).as("cnt"),
        first(col("xn")).as("na0"), first(col("yn")).as("nb0"))
      .filter(
        lit(3) * least(col("na0") - col("ia"), col("nb0") - col("jb")) >=
          col("na0") + col("nb0"))
      .filter(
        lit(3) * (col("cnt") + least(col("na0") - 1 - col("ia_max"),
          col("nb0") - 1 - col("jb_max"))) >= col("na0") + col("nb0"))
      .select("a_id", "b_id")
  }

  /** Full n-gram Jaccard pair pipeline over per-doc stats `(doc_id, gs,
    * n)` and a viral-gram list `(g)`: candidates → exact verify →
    * `(a_id, b_id, shared, jaccard)` (unordered).
    *
    * CONTRACT (deterministic, oracle-expressible): a pair qualifies iff
    * Jaccard ≥ 0.5 on the FULL gram sets AND, when any viral gram
    * exists, Jaccard ≥ 0.5 on the CAPPED sets too — similarity may not
    * rest on corpus-boilerplate grams (the stopword-removal contract at
    * [[NgramDfCap]]). The capped-side VERIFY (not just capped candidate
    * generation) is what makes the output a function of the data alone:
    * without it, pairs with capped-J < 0.5 but full-J ≥ 0.5 would
    * appear or not depending on which extra candidates the prefix
    * filters happened to over-generate. With no viral grams both
    * conditions coincide and the capped joins are skipped entirely. */
  private[registry] def ngramJaccardPairs(stats: DataFrame, viral: DataFrame,
      df2: Option[DataFrame] = None): DataFrame = {
    val hasViral = !Caching.persistOnce(viral).isEmpty
    val capped =
      if (hasViral) Some(Caching.persistOnce(cappedGramStats(stats, viral)))
      else None
    val cand = ngramPrefixJoin(
      capped.getOrElse(stats.select(col("doc_id"), col("gs"), col("n"))), df2)
    val jac = col("shared").cast("double") /
      (col("na") + col("nb") - col("shared"))
    val verified = cand.hint("shuffle_hash")
      .join(stats.select(col("doc_id").as("a_id"), col("gs").as("gs_a"),
        col("n").as("na")), "a_id")
      .hint("shuffle_hash")
      .join(stats.select(col("doc_id").as("b_id"), col("gs").as("gs_b"),
        col("n").as("nb")), "b_id")
      .withColumn("shared",
        icount(stats.sparkSession, col("gs_a"), col("gs_b")))
      .filter(jac >= 0.5)
    val qualified = capped match {
      case None => verified
      case Some(cs) =>
        val jacC = col("shared_c").cast("double") /
          (col("na_c") + col("nb_c") - col("shared_c"))
        verified.hint("shuffle_hash")
          .join(cs.select(col("doc_id").as("a_id"), col("gs").as("gs_ca"),
            col("n").as("na_c")), "a_id")
          .hint("shuffle_hash")
          .join(cs.select(col("doc_id").as("b_id"), col("gs").as("gs_cb"),
            col("n").as("nb_c")), "b_id")
          .withColumn("shared_c",
            icount(stats.sparkSession, col("gs_ca"), col("gs_cb")))
          .filter(jacC >= 0.5)
    }
    qualified.select(col("a_id"), col("b_id"), col("shared"),
      jac.as("jaccard"))
  }

  /** SimHash near-dup pairs (shared by the simhash gate query and the
    * component clustering): vote-aggregate fingerprint, pigeonhole
    * chunk equi-join, hamming ≤ 3 verify. */
  private[registry] def simhashPairs(s: SparkSession, d: String): DataFrame = {
    val gh = gramHashes(s, d)
    val fp = Caching.memoDf(s, s"simhashFp:$d", eager = true) {
      gh.groupBy("doc_id")
        .agg(SimHash.simhash(col("g")).as("sim_sig"))
    }
    val chunkStructs = array(
      struct(lit(0).as("c"), (col("sim_sig").bitwiseAND(255L)).as("cv")),
      struct(lit(1).as("c"),
        (shiftright(col("sim_sig"), 8).bitwiseAND(255L)).as("cv")),
      struct(lit(2).as("c"),
        (shiftright(col("sim_sig"), 16).bitwiseAND(255L)).as("cv")),
      struct(lit(3).as("c"),
        (shiftright(col("sim_sig"), 24).bitwiseAND(127L)).as("cv")))
    val chunks = fp.select(col("doc_id"), col("sim_sig"),
        explode(chunkStructs).as("ch"))
      .select(col("doc_id"), col("sim_sig"),
        col("ch.c").as("c"), col("ch.cv").as("cv"))
    val hamming = bit_count(col("sig_a").bitwiseXOR(col("sig_b")))
    chunks.as("x").join(chunks.as("y"),
        col("x.c") === col("y.c") && col("x.cv") === col("y.cv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.sim_sig").as("sig_a"), col("y.sim_sig").as("sig_b"))
      .distinct()
      .filter(hamming <= 3)
      .select(col("a_id"), col("b_id"), col("sig_a"), col("sig_b"),
        hamming.cast("long").as("hamming"))
  }

  /** Min-label connected components over a near-dup pair set
    * `(a_id, b_id)` → labels `(node, comp)` with comp = min doc id of
    * the component. Shared by the components query and the curation
    * pipeline's near-dup stage.
    *
    * The pair graph is ≪ corpus by construction (near-dup pairs survive
    * the hamming cut), so the iterative joins/aggs must NOT run at the
    * corpus-sized session shuffle width — that makes every iteration a
    * fleet of empty tasks. Size the iteration shuffles from the MEASURED
    * edge count (the deterministic form of AQE's coalesce, without its
    * per-stage replan latency) via EXPLICIT repartition of the iterated
    * frames — never by mutating the session-global shuffle width, which
    * would leak a narrowed conf into concurrent queries on the same
    * session. Edges are bucketed on u once; label frames keep
    * hashpartitioning(node) through localCheckpoint (LogicalRDD
    * preserves outputPartitioning), so each iteration pays exactly one
    * explicit exchange — the post-union re-bucket — at the measured
    * width. Each iteration localCheckpoints (eager): that
    * both materializes it AND truncates lineage — with plain persist the
    * analyzer re-walks a plan that deepens every iteration. Labels only
    * ever decrease → equal sum-checksum across iterations ⇒ fixpoint;
    * the driver sees ONE scalar per iteration, never rows (sum over zero
    * rows is NULL → 0: an empty pair graph converges immediately to the
    * empty result, like the oracle). Session conf is only READ here, so
    * concurrent callers on one session are safe. Iteration checkpoint
    * blocks are tiny (pair-graph label rows) and are released by the
    * ContextCleaner on GC, same as [[graft.llmops.Similarity]]'s
    * lshCollisionPairs.
    */
  /** Component labels over the SimHash near-dup graph — the shared
    * derived artifact consumed by the components query, cluster stats,
    * the leakage-safe split, and the curation funnel. The fixpoint's
    * result lives in checkpoint blocks (not the session cache), so it
    * is memoized with epoch semantics: one computation per cache
    * generation, full recompute after a clearCache. */
  private[registry] def simhashComponents(s: SparkSession, d: String): DataFrame =
    Caching.memoDfEpoch(s, s"simhashComponents:$d") {
      componentLabels(s, simhashPairs(s, d))
    }

  /** Single-hop rounds tolerated before the fixpoint escalates to
    * pointer doubling (see the loop comment). MEASURED, round 11: a
    * squaring round costs ~3 exchanges (labels self-join on comp, both
    * sides unpartitioned) where a hop is one partition-preserved join
    * — so on the sf0.1 phash graph (388-node chain, ecc 27, 28 hops)
    * escalating at 12 REGRESSED llm_mm_phash_cluster 3.3 → 5.5 s idle.
    * 32 keeps every measured real graph (dense blobs ≤ ~6 rounds, the
    * worst observed chain 28) in the cheap single-hop regime; only
    * genuinely adversarial chains pay the O(log diameter) escalation,
    * whose total stays ≤ threshold + ~2·log₂(n) rounds. */
  private[registry] val EscalateAfter = 32

  /** Single-hop layers folded into ONE materialized plan per fixpoint
    * round (r15): the loop is driver-action-bound, so batching K hops
    * per localCheckpoint+checksum pair divides the action count by K.
    * 4 keeps the per-round plan shallow (4 join/agg layers) while
    * cutting the ecc-27 phash chain from 28 to 7 materializations;
    * convergence detection coarsens to K-hop granularity, wasting at
    * most K−1 no-op hops inside the final round — stages over an
    * already-converged one-partition label frame, not new jobs. */
  private[registry] val HopsPerAction = 4

  /** The maintained-IVF gate's index, built once per (JVM, sf dir):
    * two thirds of the corpus at [[graft.llmops.IvfIndex.build]],
    * the last third through keyed maintenance — so the gate probes an
    * index that LIVED, not a fresh build. */
  private val ivfRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ivfMaintainedRoot(s: SparkSession, d: String): String =
    ivfRoots.computeIfAbsent(d, _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-ivfidx").toString + "/ivf"
      val e = t(s, d, "embeddings").select("vec_id", "embedding")
      graft.llmops.IvfIndex.build(s, root,
        e.filter(col("vec_id") % 3 =!= 0))
      graft.llmops.IvfIndex.addVectors(s, root,
        e.filter(col("vec_id") % 3 === 0))
      root
    })

  private[registry] def componentLabels(s: SparkSession, pairs: DataFrame): DataFrame =
    componentLabelsCounted(s, pairs)._1

  /** [[componentLabels]] plus the driver-action round count (hops +
    * squarings) — the number the adaptive-escalation spec pins. */
  private[registry] def componentLabelsCounted(s: SparkSession,
      pairs: DataFrame, escalateAfter: Int = EscalateAfter): (DataFrame, Int) = {
    val dup = pairs.select("a_id", "b_id")
    val edgesRaw = dup.select(col("a_id").as("u"), col("b_id").as("v"))
      .unionByName(dup.select(col("b_id").as("u"), col("a_id").as("v")))
      .persist()
    try {
      val nEdges = edgesRaw.count()
      val sessParts = graft.core.GraftSession.shuffleWidth(s).toLong
      val iterParts = math.max(1L,
        math.min(sessParts, nEdges / 50000L + 1L)).toInt
      val edges = edgesRaw.repartition(iterParts, col("u")).persist()
      // self-loops make a hop layer SINGLE-REFERENCE: without them each
      // batched layer needed `hopped` twice (join side + union side to
      // keep a node's own label), and Catalyst's lack of plan-subtree
      // CSE made the K-layer lazy plan re-evaluate layer k-1 twice per
      // layer — 2^K work (r15 measured the union form SLOWER than the
      // unbatched loop it was meant to fix). min over self+neighbors
      // ≡ min(own, neighbors): identical hop semantics.
      val edgesSelf = edges
        .unionByName(edges.select(col("u")).distinct()
          .select(col("u"), col("u").as("v")))
        .repartition(iterParts, col("u")).persist()
      try {
        // convergence checksum FOLDED into the materialization action
        // (r16, guide §1.2: the loop is driver-action-bound, so the
        // separate checksum agg job per round was half the action
        // count): a CollectMetrics observation rides the eager
        // localCheckpoint's own execution — one action per round where
        // r15 paid two (checkpoint + checksum agg).
        def checkpointWithChecksum(df: DataFrame): (DataFrame, Long) = {
          val obs = org.apache.spark.sql.Observation()
          val out = df.observe(obs, sum(col("comp")).as("cc"))
            .localCheckpoint(true)
          val cc = Option(obs.get("cc").asInstanceOf[java.lang.Long])
            .map(_.toLong).getOrElse(0L)
          (out, cc)
        }
        val (labels0, checksum0) = checkpointWithChecksum(
          edges.select(col("u").as("node")).distinct()
            .withColumn("comp", col("node")))
        var labels = labels0
        // the fixpoint only ever needs the LATEST labels frame: once
        // `next` is materialized (eager localCheckpoint), the previous
        // iteration's checkpoint blocks are dead — release them now
        // instead of waiting for the ContextCleaner to GC the frame,
        // so a long session running the component family repeatedly
        // doesn't accumulate checkpoint storage between GCs
        def chkRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
          df.queryExecution.analyzed.collectFirst {
            case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
          }
        var checksum = checksum0
        var converged = false
        var rounds = 0
        while (!converged) {
          // The loop is driver-action-latency-bound at pair-graph sizes
          // (the label frame fits one partition), so hops are BATCHED:
          // each materialization applies HopsPerAction single-hop
          // layers lazily in ONE plan (K joins/aggs = K cheap stages of
          // one job) and pays the localCheckpoint + checksum actions
          // once per batch — r15 measured the unbatched loop at 2
          // driver actions per hop, ~60 ms each, which WAS
          // llm_mm_phash_cluster's 3.4 s on the 388-node ecc-27 chain.
          // `rounds` still counts HOPS (+1 per squaring), so the
          // escalation threshold and the spec bounds keep their
          // meaning. MEASURED NON-FIX from r11 still stands: a
          // comp := comp(comp) path-halving join per round cut rounds
          // only 28 → 20 while doubling actions — batching attacks the
          // action count directly instead.
          // ADAPTIVE ESCALATION for the pathological shape: a hop
          // count past `escalateAfter` means a long-chain component
          // (the near-identical-shingle llm_dedup_substring shape),
          // where hops pay O(diameter) rounds; from then on, each hop
          // batch is followed by comp := comp(comp) SQUARED TO
          // SATURATION — label-reach doubles per squaring, so the
          // remaining rounds are O(log diameter) while the common
          // case never pays the extra actions.
          var hopped = labels
          var k = 0
          while (k < HopsPerAction) {
            rounds += 1
            hopped = hopped.join(edgesSelf, col("node") === col("u"))
              .select(col("v").as("node"), col("comp"))
              .repartition(iterParts, col("node"))
              .groupBy("node").agg(min("comp").as("comp"))
            k += 1
          }
          val (next, s1) = checkpointWithChecksum(hopped)
          chkRdd(labels).foreach(_.unpersist(false))
          labels = next
          converged = s1 == checksum
          checksum = s1
          if (!converged && rounds >= escalateAfter) {
            // pointer doubling: every comp value is itself a node id
            // (labels start as comp = node and only ever take existing
            // node ids via min), so the self-join resolves every row;
            // comp(comp(n)) <= comp(n) keeps the checksum monotone
            var saturated = false
            while (!saturated) {
              rounds += 1
              val parent = labels
                .select(col("node").as("p_node"), col("comp").as("p_comp"))
              val (sq, s2) = checkpointWithChecksum(labels
                .join(parent, col("comp") === col("p_node"))
                .select(col("node"), col("p_comp").as("comp"))
                .repartition(iterParts, col("node")))
              chkRdd(labels).foreach(_.unpersist(false))
              labels = sq
              saturated = s2 == checksum
              checksum = s2
            }
          }
        }
        (labels, rounds)
      } finally {
        edgesSelf.unpersist(false)
        edges.unpersist(false)
      }
    } finally edgesRaw.unpersist(false)
  }

  /** SQL body of the simhash pair pipeline (the CTE chain after
    * ShingleCtes), shared by the simhash oracle and the components
    * oracle. */
  private[registry] val SimhashPairCtes =
    """votes AS (
      |  SELECT doc_id, b,
      |         SUM(CASE WHEN (g >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      |  FROM gh CROSS JOIN (SELECT unnest(generate_series(0, 30)) AS b)
      |  GROUP BY doc_id, b
      |), fp AS (
      |  SELECT doc_id,
      |         CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b)
      |                       ELSE 0 END) AS BIGINT) AS sim_sig
      |  FROM votes GROUP BY doc_id
      |), chunks AS (
      |  SELECT doc_id, sim_sig, c,
      |         CASE c WHEN 0 THEN sim_sig & 255
      |                WHEN 1 THEN (sim_sig >> 8) & 255
      |                WHEN 2 THEN (sim_sig >> 16) & 255
      |                ELSE (sim_sig >> 24) & 127 END AS cv
      |  FROM fp CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS c)
      |), pairs AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
      |         a.sim_sig AS sig_a, b.sim_sig AS sig_b
      |  FROM chunks a JOIN chunks b
      |    ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
      |)"""

  /** SQL of the near-dup component chain after [[SimhashPairCtes]]:
    * hamming cut → doubled edge list → recursive transitive closure →
    * min-label canonical per member. The enclosing query must say
    * `WITH RECURSIVE`. One definition serves every oracle that clusters
    * near-dups (components, cluster stats, curation funnel, source
    * matrix) so the hamming threshold — like the Spark twin's single
    * filter in [[simhashPairs]] — lives in exactly one place. */
  private[registry] val ComponentCtes =
    """dup AS (
      |  SELECT a_id, b_id,
      |         CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
      |  FROM pairs WHERE bit_count(xor(sig_a, sig_b)) <= 3
      |), edges AS (
      |  SELECT a_id AS u, b_id AS v FROM dup
      |  UNION ALL SELECT b_id, a_id FROM dup
      |), closure(src, dst) AS (
      |  SELECT u, v FROM edges
      |  UNION
      |  SELECT c.src, e.v FROM closure c JOIN edges e ON c.dst = e.u
      |), comp AS (
      |  SELECT src AS doc_id, least(src, min(dst)) AS comp
      |  FROM closure GROUP BY src
      |)"""

  /** Shared BPE-training oracle CTE chain: word frequencies → char
    * state s0 → three unrolled merge steps (pair counts pN, best pair
    * bN, run-parity greedy application → state sN). Consumed by the
    * llm_bpe_merges gate (reads b1..b3) and llm_bpe_encode (reads the
    * final state s3). The run-parity window phrasing is the relational
    * equivalent of [[graft.llmops.Bpe.applyMerge]]'s greedy fold. */
  private[registry] val BpeCtes: String = {
    def iter(n: Int): String = {
      val prev = s"s${n - 1}"
      s"""p$n AS (
        |  SELECT u.pair, SUM(u.freq) AS cnt FROM (
        |    SELECT freq, unnest([tk[i] || ' ' || tk[i+1]
        |                         for i in range(1, len(tk))]) AS pair
        |    FROM (SELECT regexp_split_to_array(seq, ' ') AS tk, freq
        |          FROM $prev)
        |  ) u GROUP BY u.pair
        |), b$n AS (
        |  SELECT pair, cnt FROM p$n ORDER BY cnt DESC, pair LIMIT 1
        |), e$n AS (
        |  SELECT s.w, s.freq, ii.i, s.tk[ii.i] AS sym,
        |         CASE WHEN ii.i < len(s.tk)
        |               AND s.tk[ii.i] = split_part(b.pair, ' ', 1)
        |               AND s.tk[ii.i+1] = split_part(b.pair, ' ', 2)
        |              THEN 1 ELSE 0 END AS hit
        |  FROM (SELECT w, freq, regexp_split_to_array(seq, ' ') AS tk
        |        FROM $prev) s
        |       CROSS JOIN b$n b,
        |       LATERAL (SELECT unnest(range(1, len(s.tk) + 1)) AS i) ii
        |), m$n AS (
        |  SELECT w, i, (i - MIN(i) OVER (PARTITION BY w, run)) % 2 = 0 AS dm
        |  FROM (SELECT w, i,
        |               i - ROW_NUMBER() OVER (PARTITION BY w ORDER BY i)
        |                 AS run
        |        FROM e$n WHERE hit = 1)
        |), s$n AS (
        |  SELECT e.w, ANY_VALUE(e.freq) AS freq,
        |         string_agg(CASE WHEN cur.dm THEN replace(b.pair, ' ', '')
        |                         WHEN prev.dm THEN NULL
        |                         ELSE e.sym END, ' ' ORDER BY e.i) AS seq
        |  FROM e$n e CROSS JOIN b$n b
        |    LEFT JOIN m$n cur ON cur.w = e.w AND cur.i = e.i
        |    LEFT JOIN m$n prev ON prev.w = e.w AND prev.i = e.i - 1
        |  GROUP BY e.w
        |)"""
    }
    s"""toks AS (
      |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
      |  FROM documents WHERE length(trim(text)) > 0
      |), w0 AS (
      |  SELECT w, COUNT(*) AS freq FROM toks GROUP BY w
      |), s0 AS (
      |  SELECT w, freq, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq
      |  FROM w0
      |), ${Seq(1, 2, 3).map(iter).mkString(",\n")}"""
  }

  /** The BPE trainer's input: the corpus word-frequency table, off the
    * shared token cache. */
  private def bpeWords(s: SparkSession, d: String): DataFrame =
    tokenArrays(s, d)
      .select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Duplicated positional 5-gram starts `(doc_id, i)` — the shared
    * substrate of the exact-substring family (detection, removal, and
    * the curation funnel's low-dup gate): one postings exchange on the
    * gram hash, persisted per (session, dir). */
  private[registry] def substringDupStarts(s: SparkSession, d: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 5
    // eager: the build is the dominant cost of every consumer's first
    // job, and the curation funnel pins it CONCURRENTLY with the bigram
    // LM chain (Caching.pinConcurrently) — lazy marking would defer the
    // work back into the serial stage-2 job
    Caching.memoDf(s, s"subDupStarts:$d", eager = true) {
      // count() OVER (partition by g), not aggregate + semi join: the
      // window shuffles and sorts the positional-gram stream ONCE,
      // where the join form computes the gram derivation TWICE (once
      // for the dup-set aggregate, once for the probe) — the gram
      // derivation is the dominant cost, so one sorted pass beats two
      // unsorted ones (measured: the join form doubled
      // llm_dedup_substring and the funnel's s2 stage at sf1). The
      // derivation itself is the fused positional kernel — one pass,
      // no per-gram String/array allocation (the HOF chain paid an
      // interpreted k-token concat per position plus an md5 over the
      // materialized string).
      tokenArrays(s, d).filter(size(col("tk")) >= k)
        .select(col("doc_id"),
          posexplode(Text.positionalShingleHashes(col("tk"), k))
            .as(Seq("i", "g")))
        .withColumn("occ", count(lit(1)).over(Window.partitionBy("g")))
        .filter(col("occ") > 1)
        .select("doc_id", "i")
    }
  }

  /** Per-doc duplicated-token counts from the merged duplicated
    * windows (the lead() interval union over [[substringDupStarts]]). */
  private[registry] def substringDupTokens(s: SparkSession, d: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 5
    val wDoc = Window.partitionBy("doc_id").orderBy("i")
    substringDupStarts(s, d)
      .withColumn("c", least(lit(k),
        coalesce(lead(col("i"), 1).over(wDoc) - col("i"), lit(k))))
      .groupBy("doc_id")
      .agg(sum("c").cast("long").as("dup_tokens"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ── Exact dedup: content-hash groupBy, deterministic survivor.
    //    At 100 TB this is one shuffle on md5(text) with map-side combine.
    sql("llm_dedup_exact",
      """SELECT md5(text) AS h, CAST(min(doc_id) AS BIGINT) AS keep_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""")(
      (s, d) => t(s, d, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        // persist before the global sort: the sampler otherwise re-runs
        // the corpus md5 + aggregation; the cached frame is 3 narrow
        // columns per distinct hash
        .transform(graft.core.Caching.persistOnce)
        .orderBy("keep_id")),

    // ── INCREMENTAL dedup: Bloom screen + exact confirm. The incoming
    //    batch (doc_id ≡ 0 mod 3) is checked against the standing corpus
    //    (the other two thirds) on a normalized 8-token head fingerprint
    //    — the doc-head key that actually collides in this fixture (the
    //    corpus has no exact-text dups at sf0.01). The corpus text never
    //    shuffles: one tree-aggregated Bloom blob screens the batch, and
    //    only candidates reach the confirm join (see llmops.BloomDedup
    //    for the 100 TB sharding story). The oracle is the exact
    //    membership semantics — the screen is invisible by construction.
    sql("llm_dedup_bloom",
      """WITH keyed AS (
        |  SELECT doc_id,
        |         array_to_string((regexp_split_to_array(trim(lower(text)), '\s+'))[1:8], ' ') AS k
        |  FROM documents
        |)
        |SELECT b.doc_id,
        |       b.k IN (SELECT k FROM keyed WHERE doc_id % 3 <> 0) AS is_dup
        |FROM keyed b WHERE b.doc_id % 3 = 0 ORDER BY b.doc_id""")(
      (s, d) => {
        val keyed = t(s, d, "documents").select(col("doc_id"),
          array_join(slice(split(trim(lower(col("text"))), "\\s+", 9), 1, 8), " ").as("k"))
        // persist-before-sort like the sharded twin: the range sampler
        // must not re-execute the bloom chain
        graft.core.Caching.persistOnce(BloomDedup.flagDups(
            batch = keyed.filter(col("doc_id") % 3 === 0),
            ref = keyed.filter(col("doc_id") % 3 =!= 0),
            keyCol = "k")
          .select(col("doc_id"), col("is_dup")))
          .orderBy("doc_id")
      }),

    // ── SHARDED variant under the same oracle (identical exact
    //    semantics — the screen shape is the only difference): the
    //    corpus Bloom splits into 8 per-shard blobs probed through the
    //    column-valued graft_bloom_probe expression, the >10⁹-key path
    //    where no single driver-bounded blob can hold the key space.
    sql("llm_dedup_bloom_sharded",
      """WITH keyed AS (
        |  SELECT doc_id,
        |         array_to_string((regexp_split_to_array(trim(lower(text)), '\s+'))[1:8], ' ') AS k
        |  FROM documents
        |)
        |SELECT b.doc_id,
        |       b.k IN (SELECT k FROM keyed WHERE doc_id % 3 <> 0) AS is_dup
        |FROM keyed b WHERE b.doc_id % 3 = 0 ORDER BY b.doc_id""")(
      (s, d) => {
        val keyed = t(s, d, "documents").select(col("doc_id"),
          array_join(slice(split(trim(lower(col("text"))), "\\s+", 9), 1, 8), " ").as("k"))
        // batch-sized result, EXPENSIVE child (two key scans + bloom
        // fold + confirm join): persist before the global sort so the
        // range sampler reads the cache instead of re-executing the
        // whole chain (the sampler runs the uncached child once, the
        // exchange runs it again — measured ~2× on this query)
        graft.core.Caching.persistOnce(BloomDedup.flagDupsSharded(
            batch = keyed.filter(col("doc_id") % 3 === 0),
            ref = keyed.filter(col("doc_id") % 3 =!= 0),
            keyCol = "k")
          .select(col("doc_id"), col("is_dup")))
          .orderBy("doc_id")
      }),

    // ── EXACT SUBSTRING duplication (Lee et al. 2022, "Deduplicating
    //    Training Data Makes Language Models Better"): a token position
    //    is duplicated when the k-token window starting there occurs
    //    more than once in the corpus (any document, any position — the
    //    paper's 50-byte window becomes a 5-token window at this
    //    corpus' grain). Per doc: total tokens, duplicated-token count
    //    (the union of overlapping duplicated windows, merged with one
    //    lead() pass over sorted starts), duplicated fraction, and the
    //    ≥20% drop flag as an exact integer comparison. The reference
    //    algorithm builds one corpus-wide suffix array — inherently
    //    single-machine; the distributed equivalent is positional
    //    k-gram occurrence counting: ONE exchange on the gram hash for
    //    the occurrence window, then the interval merge rides the token
    //    cache's existing hashpartitioning(doc_id). Both engines count
    //    over the shared 60-bit gram hash, so any collision (rare;
    //    production would widen to 128-bit) affects both identically.
    sql("llm_dedup_substring",
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
        |  FROM documents WHERE length(trim(text)) > 0
        |), pg AS (
        |  SELECT doc_id, len(tk) AS ntok,
        |         unnest(range(1, len(tk) - 3)) AS i,
        |         unnest([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
        |                 tk[i+3] || ' ' || tk[i+4]
        |                 for i in range(1, len(tk) - 3)]) AS gram
        |  FROM toks
        |), pgh AS (
        |  SELECT doc_id, i,
        |         CAST(('0x' || substring(md5(gram), 1, 15)) AS BIGINT)
        |           % 2147483647 AS g
        |  FROM pg
        |), occ AS (
        |  SELECT doc_id, i, COUNT(*) OVER (PARTITION BY g) AS occ FROM pgh
        |), cov AS (
        |  SELECT doc_id,
        |         LEAST(5, COALESCE(
        |           LEAD(i) OVER (PARTITION BY doc_id ORDER BY i) - i, 5)) AS c
        |  FROM occ WHERE occ > 1
        |), agg AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dup_tokens
        |  FROM cov GROUP BY doc_id
        |)
        |SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
        |       COALESCE(a.dup_tokens, 0) AS dup_tokens,
        |       CAST(COALESCE(a.dup_tokens, 0) AS DOUBLE) / len(t.tk) AS dup_frac,
        |       COALESCE(a.dup_tokens, 0) * 5 >= len(t.tk) AS flagged
        |FROM toks t LEFT JOIN agg a USING (doc_id)
        |ORDER BY t.doc_id""")(
      (s, d) => {
        // duplicated starts off the shared memo (one postings exchange,
        // persisted; 0-based starts vs the oracle's 1-based — only
        // differences and order matter), interval-merged per doc by the
        // lead() pass that rides the token cache's partitioning
        val agg = substringDupTokens(s, d)
        tokenArrays(s, d)
          .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"))
          .join(agg, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
            (coalesce(col("dup_tokens"), lit(0L)).cast("double") /
              col("n_tokens")).as("dup_frac"),
            (coalesce(col("dup_tokens"), lit(0L)) * 5 >= col("n_tokens"))
              .as("flagged"))
          // persist before the global sort: the range sampler otherwise
          // re-executes the uncached tail (r14 recipe)
          .transform(graft.core.Caching.persistOnce)
          .orderBy("doc_id")
      }),

    // ── Exact-substring REMOVAL (the second half of the Lee et al.
    //    pipeline: detect, then CUT the duplicated spans): tokens
    //    covered by any duplicated 5-gram window are dropped and the
    //    cleaned text is fingerprinted. Spark keeps the rebuild NARROW:
    //    duplicated starts aggregate per doc (riding the same
    //    partitioning as the detection pass), the covered-position set
    //    and the kept-token rebuild are per-row array folds — no
    //    token-level explode/re-aggregate cycle. The oracle phrases the
    //    same thing as a positional anti-join.
    sql("llm_dedup_substring_rm",
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
        |  FROM documents WHERE length(trim(text)) > 0
        |), pg AS (
        |  SELECT doc_id,
        |         unnest(range(1, len(tk) - 3)) AS i,
        |         unnest([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
        |                 tk[i+3] || ' ' || tk[i+4]
        |                 for i in range(1, len(tk) - 3)]) AS gram
        |  FROM toks
        |), pgh AS (
        |  SELECT doc_id, i,
        |         CAST(('0x' || substring(md5(gram), 1, 15)) AS BIGINT)
        |           % 2147483647 AS g
        |  FROM pg
        |), occ AS (
        |  SELECT doc_id, i, COUNT(*) OVER (PARTITION BY g) AS occ FROM pgh
        |), cov AS (
        |  SELECT DISTINCT doc_id, unnest(range(i, i + 5)) AS j
        |  FROM occ WHERE occ > 1
        |), pos AS (
        |  SELECT doc_id, unnest(tk) AS tok,
        |         unnest(range(1, len(tk) + 1)) AS j
        |  FROM toks
        |), kept AS (
        |  SELECT p.doc_id, string_agg(p.tok, ' ' ORDER BY p.j) AS txt,
        |         COUNT(*) AS n_kept
        |  FROM pos p ANTI JOIN cov c ON c.doc_id = p.doc_id AND c.j = p.j
        |  GROUP BY p.doc_id
        |)
        |SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
        |       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS kept_tokens,
        |       CAST(len(t.tk) - COALESCE(k.n_kept, 0) AS BIGINT)
        |         AS removed_tokens,
        |       md5(COALESCE(k.txt, '')) AS kept_sig
        |FROM toks t LEFT JOIN kept k USING (doc_id)
        |ORDER BY t.doc_id""")(
      (s, d) => {
        val k = 5
        val toks = tokenArrays(s, d)
        val starts = substringDupStarts(s, d)
          .groupBy("doc_id").agg(collect_list("i").as("starts"))
        val keptArr = filter(
          transform(sequence(lit(0), size(col("tk")) - 1), j =>
            when(array_contains(col("covered"), j), lit(null))
              .otherwise(element_at(col("tk"), j + 1))),
          x => x.isNotNull)
        toks.join(starts, Seq("doc_id"), "left")
          .withColumn("covered", array_distinct(flatten(transform(
            coalesce(col("starts"), array().cast("array<int>")),
            st => sequence(st, st + (k - 1))))))
          .withColumn("kept", keptArr)
          .select(col("doc_id"),
            size(col("tk")).cast("long").as("n_tokens"),
            size(col("kept")).cast("long").as("kept_tokens"),
            (size(col("tk")) - size(col("kept"))).cast("long")
              .as("removed_tokens"),
            md5(array_join(col("kept"), " ")).as("kept_sig"))
          // persist before the global sort: the range sampler otherwise
          // re-executes the uncached tail (r14 recipe)
          .transform(graft.core.Caching.persistOnce)
          .orderBy("doc_id")
      }),

    // ── n-gram Jaccard near-dup pairs — EXACT, and fully distributed:
    //    AllPairs/PPJoin candidate generation (see ngramCandidates) with
    //    a viral-gram df cap, then exact verification on full gram sets.
    //    Jaccard is defined over HASHED shingle sets (60-bit md5-derived,
    //    same function both engines — any collision affects both
    //    identically): the pair join runs on integers, not gram strings.
    sql("llm_dedup_ngram_jaccard",
      // The oracle ENCODES the df-cap contract (not just the uncapped
      // ideal): qualify on full-set Jaccard AND capped-set Jaccard, where
      // the capped sets drop grams with document frequency > NgramDfCap.
      // On corpora with no viral gram (every df ≤ cap) the capped CTEs
      // are the identity and this reduces to the plain exact form.
      s"""WITH $ShingleCtes, ghd AS (
        |  SELECT DISTINCT doc_id, g FROM gh
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM ghd GROUP BY doc_id
        |), ghd_c AS (
        |  SELECT doc_id, g FROM ghd
        |  WHERE g NOT IN (SELECT g FROM ghd GROUP BY g
        |                  HAVING count(*) > $NgramDfCap)
        |), sizes_c AS (
        |  SELECT doc_id, count(*) AS n FROM ghd_c GROUP BY doc_id
        |), shared AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared
        |  FROM ghd a JOIN ghd b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), shared_c AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared_c
        |  FROM ghd_c a JOIN ghd_c b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT s.a_id, s.b_id, CAST(s.shared AS BIGINT) AS shared,
        |       CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared) AS jaccard
        |FROM shared s JOIN sizes sa ON sa.doc_id = s.a_id
        |              JOIN sizes sb ON sb.doc_id = s.b_id
        |              JOIN shared_c c ON c.a_id = s.a_id AND c.b_id = s.b_id
        |              JOIN sizes_c ca ON ca.doc_id = s.a_id
        |              JOIN sizes_c cb ON cb.doc_id = s.b_id
        |WHERE CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared) >= 0.5
        |  AND CAST(c.shared_c AS DOUBLE) / (ca.n + cb.n - c.shared_c) >= 0.5
        |ORDER BY s.a_id, s.b_id""")(
      (s, d) => {
        // Distributed postings equi-join — no driver-side state, no
        // corpus broadcast. (1) candidate pairs come from a self-join of
        // the (doc_id, g) postings on the gram hash, with a document-
        // frequency cap on the grams used for CANDIDATE GENERATION:
        // a gram in df docs contributes df² pair rows, so one viral gram
        // would otherwise quadratically dominate the join — the standard
        // skew guard for exact short-doc overlap. (2) candidates are
        // exact-verified against the FULL gram sets (shuffle joins on
        // a_id/b_id, candidate side as build), so the df cap cannot
        // change a surviving pair's jaccard. With the cap active,
        // candidate recall is exact w.r.t. the CAPPED gram sets (see
        // ngramCandidates) — only pairs whose similarity rests on
        // corpus-boilerplate grams can be missed, the stopword-removal
        // contract documented at NgramDfCap.
        val stats = docGramStats(s, d)
        // viral-gram cap: the excluded-gram list is ≤ |postings| /
        // NgramDfCap rows BY CONSTRUCTION — broadcastable at any corpus
        // size; the df comes from the SHARED per-gram vocabulary cache
        // (gramDfFlags — contamination materializes the same frame), so
        // in a session that has run any gram-df consumer this filter is
        // a cached scan, not a corpus-wide aggregation, and the cap
        // costs a narrow anti-join instead of a window sort.
        // (With the cap active, the candidate contract weakens from
        // "shares any sub-cap gram" to "the pruning bounds hold over the
        // sub-cap collisions" — still: only boilerplate-dominated pairs
        // can be missed, and the exact verify never mis-scores a
        // surviving pair.)
        val viral = gramDfFlags(s, d)
          .filter(col("df") > NgramDfCap).select("g")
        // a second narrow slice of the same vocabulary cache: grams in
        // ≥ 2 docs, the only ones that can ever collide — lets the
        // prefix join drop df=1 postings via a colocated semi-join
        val df2 = gramDfFlags(s, d).filter(col("df") >= 2).select("g")
        ngramJaccardPairs(stats, viral, Some(df2))
          // persist before the global sort (r14 recipe)
          .transform(graft.core.Caching.persistOnce)
          .orderBy("a_id", "b_id")
      }),

    // ── MinHash + LSH near-dup detection: one-pass signature aggregate,
    //    band-key equi-join for candidates, exact verify on candidates
    //    only. The custom Aggregator's signatures are reproduced exactly
    //    by the oracle's explicit (a*g+b) mod P minimization.
    sql("llm_dedup_minhash",
      s"""WITH $ShingleCtes, sig AS (
        |  SELECT doc_id, j,
        |         min((((((j+1)*2654435761) % 2147483647) * g)
        |              + (((j+17)*40503) % 2147483647)) % 2147483647) AS h
        |  FROM gh CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j)
        |  GROUP BY doc_id, j
        |), bands AS (
        |  SELECT doc_id, j // 4 AS band,
        |         string_agg(CAST(h AS VARCHAR), '_' ORDER BY j) AS bkey
        |  FROM sig GROUP BY doc_id, j // 4
        |), ${graft.llmops.SkewGuard.oracleCandSql(
             "bands", Seq("band", "bkey"), "doc_id", "a_id", "b_id")}, est AS (
        |  SELECT c.a_id, c.b_id,
        |         CAST(SUM(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_match
        |  FROM cand c
        |  JOIN sig sa ON sa.doc_id = c.a_id
        |  JOIN sig sb ON sb.doc_id = c.b_id AND sb.j = sa.j
        |  GROUP BY 1, 2
        |), ghd AS (
        |  SELECT DISTINCT doc_id, g FROM gh
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM ghd GROUP BY doc_id
        |), shared AS (
        |  SELECT c.a_id, c.b_id, count(*) AS shared
        |  FROM cand c
        |  JOIN ghd ga ON ga.doc_id = c.a_id
        |  JOIN ghd gb ON gb.doc_id = c.b_id AND gb.g = ga.g
        |  GROUP BY 1, 2
        |)
        |SELECT e.a_id, e.b_id, e.n_match,
        |       CAST(COALESCE(sh.shared, 0) AS DOUBLE)
        |         / (sa.n + sb.n - COALESCE(sh.shared, 0)) AS jaccard
        |FROM est e
        |LEFT JOIN shared sh ON sh.a_id = e.a_id AND sh.b_id = e.b_id
        |JOIN sizes sa ON sa.doc_id = e.a_id
        |JOIN sizes sb ON sb.doc_id = e.b_id
        |ORDER BY e.a_id, e.b_id""")(
      (s, d) => {
        // Signatures fold the DISTINCT gram set (min is unaffected by
        // duplicates, so this matches the oracle's non-distinct fold);
        // they come out of docGramStats' single fused aggregation pass
        // together with the gram sets and cardinalities.
        val stats = docGramStats(s, d)
        val sig = stats.select(col("doc_id"), col("sig"))
        val bandStructs = array((0 until MinHash.NumBands).map { bnd =>
          struct(lit(bnd).as("band"),
            concat_ws("_", slice(col("sig"), bnd * MinHash.BandRows + 1,
              MinHash.BandRows)).as("bkey"))
        }: _*)
        val bands = sig.select(col("doc_id"), explode(bandStructs).as("b"))
          .select(col("doc_id"), col("b.band").as("band"), col("b.bkey").as("bkey"))
        // per-band-key size guard (SkewGuard contract, mirrored in the
        // oracle's _sized/cand CTEs): a band key shared by 10⁴ exact
        // duplicates emits a star, not a k² cell
        val cand = graft.llmops.SkewGuard
          .cellPairs(bands, Seq("band", "bkey"), "doc_id")
          .distinct()
        // Verify stage: attach each candidate's signature + gram set via
        // SHUFFLE joins keyed on doc id — the stats table is corpus-sized
        // (every doc's gram set), so broadcasting it caps the operator at
        // driver/executor memory long before 100 TB. The candidate set is
        // the SMALL side (that is the point of banding), so it is hinted
        // as the shuffled-hash build side; stats shuffles once per key
        // column, candidates twice — both exchanges are candidate- or
        // stats-partition-sized, never a full-corpus broadcast. Estimate
        // from signature agreement, exact-verify via array_intersect.
        val jac = col("shared").cast("double") /
          (col("na") + col("nb") - col("shared"))
        cand.hint("shuffle_hash")
          .join(stats.select(col("doc_id").as("a_id"),
            col("sig").as("sig_a"), col("gs").as("gs_a"),
            col("n").as("na")), "a_id")
          .hint("shuffle_hash")
          .join(stats.select(col("doc_id").as("b_id"),
            col("sig").as("sig_b"), col("gs").as("gs_b"),
            col("n").as("nb")), "b_id")
          .withColumn("n_match", aggregate(
            zip_with(col("sig_a"), col("sig_b"),
              (x, y) => when(x === y, 1L).otherwise(0L)),
            lit(0L), (acc, v) => acc + v))
          .withColumn("shared",
            icount(s, col("gs_a"), col("gs_b")))
          .select(col("a_id"), col("b_id"), col("n_match"), jac.as("jaccard"))
          // persist before the global sort: the range sampler otherwise
          // re-executes the uncached tail (r14 recipe)
          .transform(graft.core.Caching.persistOnce)
          .orderBy("a_id", "b_id")
      }),

    // ── Incremental batch-vs-corpus screening — the daily-ingest shape:
    //    the delta (doc_id % 4 = 0 here) is screened against the
    //    accumulated corpus WITHOUT a corpus self-join, from signatures
    //    alone (llmops/IncrementalDedup: batch bands broadcast, corpus
    //    cells semi-joined down to batch-touched ones then capped to the
    //    64 smallest ids via the bounded top-k aggregate, verify =
    //    matching permutation slots ≥ 32 of 64 ⇒ est. Jaccard ≥ 0.5).
    //    The oracle replays the identical signatures, the identical
    //    row_number-≤-64 cell cap, and the identical slot count.
    sql("llm_dedup_incremental",
      s"""WITH $ShingleCtes, sig AS (
        |  SELECT doc_id, j,
        |         min((((((j+1)*2654435761) % 2147483647) * g)
        |              + (((j+17)*40503) % 2147483647)) % 2147483647) AS h
        |  FROM gh CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j)
        |  GROUP BY doc_id, j
        |), bands AS (
        |  SELECT doc_id, j // 4 AS band,
        |         string_agg(CAST(h AS VARCHAR), '_' ORDER BY j) AS bkey
        |  FROM sig GROUP BY doc_id, j // 4
        |), bb AS (
        |  SELECT doc_id AS b_id, band, bkey FROM bands WHERE doc_id % 4 = 0
        |), cb AS (
        |  SELECT doc_id AS c_id, band, bkey FROM bands WHERE doc_id % 4 <> 0
        |  QUALIFY row_number() OVER (PARTITION BY band, bkey
        |                             ORDER BY doc_id) <= 64
        |), cand AS (
        |  SELECT DISTINCT b.b_id, c.c_id
        |  FROM bb b JOIN cb c USING (band, bkey)
        |), est AS (
        |  SELECT c.b_id, c.c_id,
        |         CAST(SUM(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_match
        |  FROM cand c
        |  JOIN sig sa ON sa.doc_id = c.b_id
        |  JOIN sig sb ON sb.doc_id = c.c_id AND sb.j = sa.j
        |  GROUP BY 1, 2
        |)
        |SELECT b_id, c_id, n_match,
        |       CAST(n_match AS DOUBLE) / 64 AS est_jaccard
        |FROM est WHERE n_match >= 32
        |ORDER BY b_id, c_id""")(
      (s, d) => {
        // signatures ride the shared fused-aggregation cache; the split
        // models "stored corpus sigs + today's delta" (the library's
        // TxLog-backed store path is spec-gated in IncrementalDedupSpec)
        val sigs = docGramStats(s, d).select(col("doc_id"), col("sig"))
        graft.llmops.IncrementalDedup.screen(
            sigs.filter(col("doc_id") % 4 === 0),
            sigs.filter(col("doc_id") % 4 =!= 0))
          // persist before the global sort: the range sampler otherwise
          // re-executes the uncached tail (r14 recipe)
          .transform(graft.core.Caching.persistOnce)
          .orderBy("b_id", "c_id")
      }),

    // ── SimHash near-dup detection: vote aggregate → 31-bit fingerprint;
    //    pigeonhole chunk join bounds the pair search (hamming ≤ 3 ⇒ one
    //    of 4 chunks equal).
    sql("llm_dedup_simhash",
      s"""WITH $ShingleCtes, $SimhashPairCtes
        |SELECT a_id, b_id, sig_a, sig_b,
        |       CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
        |FROM pairs WHERE bit_count(xor(sig_a, sig_b)) <= 3
        |ORDER BY a_id, b_id""")(
      (s, d) => simhashPairs(s, d).orderBy("a_id", "b_id")),

    // ── Dedup CLUSTER formation — connected components over the
    //    near-dup pair graph (the step after pair generation in every
    //    production dedup pipeline: keep min-id per component, drop the
    //    rest). Spark side: iterative min-label propagation on the PAIR
    //    graph only — per iteration one join + map-side-combined min-agg
    //    over edges (pairs ≪ corpus), iterations = cluster diameter
    //    (near-dup clusters are shallow; the driver holds only a
    //    convergence checksum). Oracle: recursive transitive closure —
    //    feasible exactly because components are small.
    sql("llm_dedup_components",
      s"""WITH RECURSIVE $ShingleCtes, $SimhashPairCtes, $ComponentCtes
        |SELECT src AS doc_id,
        |       CAST(least(src, min(dst)) AS BIGINT) AS component_id,
        |       CAST(count(DISTINCT dst) AS BIGINT) AS component_size
        |FROM closure GROUP BY src ORDER BY doc_id""")(
      (s, d) => {
        val labels = simhashComponents(s, d)
        val sizes = labels.groupBy("comp").agg(count(lit(1)).as("component_size"))
        labels.join(sizes, "comp")
          .select(col("node").as("doc_id"), col("comp").as("component_id"),
            col("component_size"))
          .orderBy("doc_id")
      }),

    // ── Brute-force cosine top-k (exact ANN baseline); queries broadcast,
    //    sequential-fold dot product for engine-identical arithmetic.
    sql("llm_sim_topk",
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS v
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS v
        |      FROM embeddings),
        |scored AS (
        |  SELECT q.q_id, c.cand_id,
        |         list_dot_product(q.v, c.v) /
        |           (sqrt(list_dot_product(q.v, q.v)) *
        |            sqrt(list_dot_product(c.v, c.v))) AS sim
        |  FROM q, c WHERE q.q_id <> c.cand_id
        |)
        |SELECT q_id,
        |       CAST(row_number() OVER (PARTITION BY q_id
        |         ORDER BY sim DESC, cand_id) AS INTEGER) AS rank,
        |       cand_id, sim
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY q_id, rank""")(
      (s, d) => {
        val e = t(s, d, "embeddings")
        // shared with llm_sim_ivf's recall baseline — one computation
        // per cache generation
        Caching.memoDf(s, s"bruteTopk5:$d") {
          Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e, k = 5)
        }.orderBy("q_id", "rank")
      }),

    // ── LSH-bucketed ANN (the scale path). FULLY oracle-gated: the
    //    hyperplanes are pure integer arithmetic (same contract as
    //    llm_dedup_embed_lsh), so DuckDB reproduces bucket assignment,
    //    the per-(table,bucket) candidate cap (SkewGuard contract,
    //    ORDER BY vec_id), and the exact cosine re-rank — the entire
    //    approximate index is hash-exact, not just recall-bounded.
    sql("llm_sim_lsh",
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |proj AS (
        |  SELECT vec_id, i // 6 AS t,
        |         SUM(CASE WHEN list_dot_product(e,
        |               [CAST((i*131 + d) * 2654435761 % 1000003 AS DOUBLE)
        |                  / 1000003.0 - 0.5 for d in range(0, 64)]) >= 0
        |             THEN CAST(1 AS BIGINT) << (i % 6) ELSE 0 END) AS bucket
        |  FROM v CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS i)
        |  GROUP BY 1, 2
        |), capped AS (
        |  SELECT vec_id, t, bucket FROM (
        |    SELECT vec_id, t, bucket,
        |           row_number() OVER (PARTITION BY t, bucket
        |             ORDER BY vec_id) AS rn
        |    FROM proj) WHERE rn <= ${graft.llmops.SkewGuard.MaxCellSize}
        |), cand AS (
        |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS cand_id
        |  FROM proj q JOIN capped c
        |    ON c.t = q.t AND c.bucket = q.bucket AND c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 100
        |), scored AS (
        |  SELECT cand.q_id, cand.cand_id,
        |         list_dot_product(a.e, b.e) /
        |           (sqrt(list_dot_product(a.e, a.e)) *
        |            sqrt(list_dot_product(b.e, b.e))) AS sim
        |  FROM cand JOIN v a ON a.vec_id = cand.q_id
        |            JOIN v b ON b.vec_id = cand.cand_id
        |)
        |SELECT q_id,
        |       CAST(row_number() OVER (PARTITION BY q_id
        |         ORDER BY sim DESC, cand_id) AS INTEGER) AS rank,
        |       cand_id, sim
        |FROM scored QUALIFY rank <= 5 ORDER BY q_id, rank""")(
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.lshTopK(e.filter(col("vec_id") < 100), e, k = 5)
          // persist before the global sort (r14 recipe: the range
          // sampler otherwise re-executes the uncached tail)
          .transform(graft.core.Caching.persistOnce)
          .orderBy("q_id", "rank")
      }),

    // ── int8 embedding quantization (storage scale path): 4× smaller
    //    codes, per-vector scale. FULLY oracle-gated: the kernel rounds
    //    HALF-UP-AWAY-FROM-ZERO via floor(|x|+0.5) — expressible exactly
    //    in DuckDB (no round(), whose tie rule differs) — and the scale,
    //    codes, and round-trip cosine are all single divisions/products
    //    of the same operands plus sequential folds, bit-identical on
    //    both engines.
    sql("llm_embed_quantize",
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |sc AS (
        |  SELECT vec_id, e,
        |         list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
        |  FROM v
        |), dq AS (
        |  SELECT vec_id, e, scale,
        |         CASE WHEN scale = 0 THEN list_transform(e, x -> 0.0)
        |              ELSE list_transform(e, x ->
        |                CASE WHEN x / scale >= 0
        |                     THEN floor(x / scale + 0.5)
        |                     ELSE -floor(abs(x / scale) + 0.5)
        |                END * scale)
        |         END AS r
        |  FROM sc
        |)
        |SELECT vec_id, scale,
        |       list_dot_product(e, r) /
        |         (sqrt(list_dot_product(e, e)) *
        |          sqrt(list_dot_product(r, r))) AS roundtrip_sim
        |FROM dq ORDER BY vec_id""")(
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        t(s, d, "embeddings")
          .select(col("vec_id"),
            Similarity.asDouble(col("embedding")).as("v"))
          .withColumn("qv", graft.llmops.Quantize.quantize(col("v")))
          .select(col("vec_id"), col("qv.scale").as("scale"),
            Similarity.cosine(col("v"),
              graft.llmops.Quantize.dequantize(col("qv"))).as("roundtrip_sim"))
          .orderBy("vec_id")
      }),

    // ── Top-k over the QUANTIZED store — the int8 codes are the form
    //    the corpus is stored in at 100 TB (4× smaller scans), so search
    //    must work directly on them. FULLY oracle-gated: codes replicate
    //    via the floor(|x|+0.5) half-up rule, and the integer dot /
    //    norms are exact (≤ 64·127² per term — no rounding anywhere in
    //    the double sums), so scores and ranks are engine-identical.
    //    Recall vs the float32 exact top-k stays bounded in LlmOpsSpec.
    sql("llm_sim_topk_q8",
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |sc AS (
        |  SELECT vec_id, e,
        |         list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
        |  FROM v
        |), qc AS (
        |  SELECT vec_id,
        |         CASE WHEN scale = 0 THEN list_transform(e, x -> 0.0)
        |              ELSE list_transform(e, x ->
        |                CASE WHEN x / scale >= 0
        |                     THEN floor(x / scale + 0.5)
        |                     ELSE -floor(abs(x / scale) + 0.5) END)
        |         END AS q
        |  FROM sc
        |), scored AS (
        |  SELECT a.vec_id AS q_id, b.vec_id AS cand_id,
        |         list_dot_product(a.q, b.q) /
        |           (sqrt(list_dot_product(a.q, a.q)) *
        |            sqrt(list_dot_product(b.q, b.q))) AS sim
        |  FROM qc a JOIN qc b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 10
        |)
        |SELECT q_id,
        |       CAST(row_number() OVER (PARTITION BY q_id
        |         ORDER BY sim DESC, cand_id) AS INTEGER) AS rank,
        |       cand_id, sim
        |FROM scored QUALIFY rank <= 5 ORDER BY q_id, rank""")(
      (s, d) => {
        // fused int8 path: quantize once (the storage write), then score
        // integer dots on the codes — symmetric scales cancel in cosine,
        // so no dequantize pass exists at all (see bruteForceTopKQ8)
        val e = t(s, d, "embeddings")
        Similarity.bruteForceTopKQ8(e.filter(col("vec_id") < 10), e, k = 5,
          cacheKey = Some(s"q8codes:$d"))
          .orderBy("q_id", "rank")
      }),

    // ── IVF ANN (second scale path): distributed k-means lists with
    //    deterministic farthest-point seeding, narrow broadcast-literal
    //    assignment, nprobe-list search. The centroid means fold floats
    //    in shuffle-fetch order, so the hit LIST is legitimately
    //    run-dependent near assignment ties — the one ANN query that
    //    cannot be row-gated. Instead it is SELF-CHECKING: recall@5
    //    against the brute-force exact baseline (computed in the same
    //    plan, no collect) must clear a floor BELOW measured behavior
    //    (measured with k-means++-style seeding + nprobe 8: 0.82
    //    sf0.001 / 0.78 sf0.01 / 0.92 sf0.1, run-stable across repeated
    //    executions; the r8 stride-seeded nprobe-4 index sat at
    //    0.54-0.60), so the emitted row tolerates residual centroid
    //    jitter yet fails the hash gate the moment the index degrades.
    //    The floor is named in the metric so the CORRECTNESS row
    //    encodes the bound it proves. The ORACLE computes the same
    //    brute-force exact baseline the recall is measured against
    //    (not a constant row). QUERY-SET SIZE (r12, measured): at 100
    //    query vectors the oracle clears the bench's 50 ms floor but
    //    the Spark side is then dominated by the SHARED brute-baseline
    //    memo materialization (attributed to whichever sim query runs
    //    first in a pass) plus ~6 stage floors — 0.46 s against a
    //    2×oracle+0.25 bound of ~0.39 s, a fixed-cost artifact no plan
    //    change removes at 2k vectors. The meaningful in-gate ANN
    //    ratio lives on llm_sim_lsh (100 queries, no shared baseline);
    //    ivf growth evidence lives in SCALE_r12.json's sf1 entry.
    sql("llm_sim_ivf",
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS v
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS v
        |      FROM embeddings),
        |scored AS (
        |  SELECT q.q_id, c.cand_id,
        |         list_dot_product(q.v, c.v) /
        |           (sqrt(list_dot_product(q.v, q.v)) *
        |            sqrt(list_dot_product(c.v, c.v))) AS sim
        |  FROM q, c WHERE q.q_id <> c.cand_id
        |), topk AS (
        |  SELECT q_id FROM (
        |    SELECT q_id, row_number() OVER (PARTITION BY q_id
        |             ORDER BY sim DESC, cand_id) AS rank
        |    FROM scored) WHERE rank <= 5
        |)
        |SELECT 'ivf_recall_at_5_vs_brute_ge_0.7' AS metric,
        |       CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_queries,
        |       TRUE AS recall_ok
        |FROM topk""")(
      (s, d) => {
        val e = t(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 10)
        // brute baseline shared with llm_sim_topk (one computation per
        // cache generation)
        val ivf = Similarity.ivfTopK(q, e, k = 5,
            cacheKey = Some(s"ivfCents:$d"))
          .select("q_id", "cand_id").withColumn("hit", lit(1L))
        Caching.memoDf(s, s"bruteTopk5:$d") {
          Similarity.bruteForceTopK(q, e, k = 5)
        }
          .select("q_id", "cand_id")
          .join(ivf, Seq("q_id", "cand_id"), "left")
          .agg(countDistinct(col("q_id")).as("n_queries"),
            count(lit(1)).as("np"),
            coalesce(sum("hit"), lit(0L)).as("nh"))
          .select(lit("ivf_recall_at_5_vs_brute_ge_0.7").as("metric"),
            col("n_queries"),
            // vacuously OK on an empty corpus: np = 0 would make the
            // ANSI divide throw, and a recall floor over zero pairs holds
            when(col("np") === 0, lit(true))
              .otherwise(col("nh").cast("double") / col("np") >= 0.7)
              .as("recall_ok"))
      }),

    // ── The MAINTAINED IVF index (llmops/IvfIndex): built once on two
    //    thirds of the corpus, the last third arrives through keyed
    //    addVectors maintenance — the serving-index lifecycle, not a
    //    per-query rebuild. Searches read ONLY the probed lists
    //    (partition-pruned; IvfIndexSpec pins pruning, add/remove
    //    precision, redelivery idempotence, and EXACT parity with a
    //    one-shot index sharing the centroids). Same self-check
    //    contract as llm_sim_ivf (centroid float folds make the hit
    //    list run-dependent near ties): recall@5 vs the shared brute
    //    baseline must clear the floor named in the metric, and the
    //    oracle performs the same brute-force baseline work.
    sql("llm_sim_ivf_maintained",
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS v
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS v
        |      FROM embeddings),
        |scored AS (
        |  SELECT q.q_id, c.cand_id,
        |         list_dot_product(q.v, c.v) /
        |           (sqrt(list_dot_product(q.v, q.v)) *
        |            sqrt(list_dot_product(c.v, c.v))) AS sim
        |  FROM q, c WHERE q.q_id <> c.cand_id
        |), topk AS (
        |  SELECT q_id FROM (
        |    SELECT q_id, row_number() OVER (PARTITION BY q_id
        |             ORDER BY sim DESC, cand_id) AS rank
        |    FROM scored) WHERE rank <= 5
        |)
        |SELECT 'ivf_maintained_recall_at_5_vs_brute_ge_0.7' AS metric,
        |       CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_queries,
        |       TRUE AS recall_ok
        |FROM topk""")(
      (s, d) => {
        val root = ivfMaintainedRoot(s, d)
        val e = t(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 10)
        val idx = graft.llmops.IvfIndex.search(s, root, q, k = 5)
          .select("q_id", "cand_id").withColumn("hit", lit(1L))
        Caching.memoDf(s, s"bruteTopk5:$d") {
          Similarity.bruteForceTopK(q, e, k = 5)
        }
          .select("q_id", "cand_id")
          .join(idx, Seq("q_id", "cand_id"), "left")
          .agg(countDistinct(col("q_id")).as("n_queries"),
            count(lit(1)).as("np"),
            coalesce(sum("hit"), lit(0L)).as("nh"))
          .select(lit("ivf_maintained_recall_at_5_vs_brute_ge_0.7").as("metric"),
            col("n_queries"),
            // vacuously OK on an empty corpus: np = 0 would make the
            // ANSI divide throw, and a recall floor over zero pairs holds
            when(col("np") === 0, lit(true))
              .otherwise(col("nh").cast("double") / col("np") >= 0.7)
              .as("recall_ok"))
      }),

    // ── PQ ANN (third scale path — the STORAGE one): per-subspace
    //    L2 codebooks, 4-bit codes, ADC approximate scoring on codes
    //    only, exact re-rank of the top rerank·k. Same self-checking
    //    contract as IVF (codebook means fold floats in shuffle order,
    //    so the hit list tolerates tie jitter): recall@5 against the
    //    shared brute baseline must clear a floor BELOW measured
    //    behavior; the floor is named in the metric. Oracle = the same
    //    brute-baseline work twin as llm_sim_ivf's (see its comment).
    sql("llm_sim_pq",
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS v
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS v
        |      FROM embeddings),
        |scored AS (
        |  SELECT q.q_id, c.cand_id,
        |         list_dot_product(q.v, c.v) /
        |           (sqrt(list_dot_product(q.v, q.v)) *
        |            sqrt(list_dot_product(c.v, c.v))) AS sim
        |  FROM q, c WHERE q.q_id <> c.cand_id
        |), topk AS (
        |  SELECT q_id FROM (
        |    SELECT q_id, row_number() OVER (PARTITION BY q_id
        |             ORDER BY sim DESC, cand_id) AS rank
        |    FROM scored) WHERE rank <= 5
        |)
        |SELECT 'pq_recall_at_5_vs_brute_ge_0.55' AS metric,
        |       CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_queries,
        |       TRUE AS recall_ok
        |FROM topk""")(
      (s, d) => {
        val e = t(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 10)
        val pq = Similarity.pqTopK(q, e, k = 5, cacheKey = Some(s"pqBooks:$d"))
          .select("q_id", "cand_id").withColumn("hit", lit(1L))
        Caching.memoDf(s, s"bruteTopk5:$d") {
          Similarity.bruteForceTopK(q, e, k = 5)
        }
          .select("q_id", "cand_id")
          .join(pq, Seq("q_id", "cand_id"), "left")
          .agg(countDistinct(col("q_id")).as("n_queries"),
            count(lit(1)).as("np"),
            coalesce(sum("hit"), lit(0L)).as("nh"))
          .select(lit("pq_recall_at_5_vs_brute_ge_0.55").as("metric"),
            col("n_queries"),
            // vacuously OK on an empty corpus: np = 0 would make the
            // ANSI divide throw, and a recall floor over zero pairs holds
            when(col("np") === 0, lit(true))
              .otherwise(col("nh").cast("double") / col("np") >= 0.55)
              .as("recall_ok"))
      }),

    // ── Language-ID heuristic: marker-stopword hits per language,
    //    fixed-precedence argmax.
    sql("llm_text_langid",
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |         list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))
        |           AS tk
        |  FROM documents
        |), scores AS (
        |  SELECT doc_id, lang,
        |    len(list_intersect(tk, ['the','a','of','and','to'])) AS s_en,
        |    len(list_intersect(tk, ['der','die','und','das','ein'])) AS s_de,
        |    len(list_intersect(tk, ['el','la','de','los','y'])) AS s_es,
        |    len(list_intersect(tk, ['le','les','et','des','un'])) AS s_fr
        |  FROM toks
        |)
        |SELECT doc_id, lang, s_en, s_de, s_es, s_fr,
        |       CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
        |            WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
        |            WHEN s_es >= s_fr THEN 'es'
        |            ELSE 'fr' END AS predicted
        |FROM scores ORDER BY doc_id""")(
      (s, d) => {
        def score(tk: Column, markers: Seq[String]): Column =
          size(array_intersect(tk, typedLit(markers))).cast("long")
        val tk = array_distinct(Text.tokens(col("text")))
        val scored = t(s, d, "documents")
          .select(col("doc_id"), col("lang"), tk.as("tk"))
          .select(col("doc_id"), col("lang"),
            score(col("tk"), Seq("the", "a", "of", "and", "to")).as("s_en"),
            score(col("tk"), Seq("der", "die", "und", "das", "ein")).as("s_de"),
            score(col("tk"), Seq("el", "la", "de", "los", "y")).as("s_es"),
            score(col("tk"), Seq("le", "les", "et", "des", "un")).as("s_fr"))
        scored.withColumn("predicted",
            when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
              col("s_en") >= col("s_fr"), "en")
              .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
              .when(col("s_es") >= col("s_fr"), "es")
              .otherwise("fr"))
          .orderBy("doc_id")
      }),

    // ── Language-ID, char-trigram profile variant: the n-gram form real
    //    langid uses (marker stopwords break on fragments/compounds;
    //    char trigrams don't need token boundaries). Score = overlap of
    //    the doc's distinct char trigrams with a fixed per-language
    //    profile; same fixed-precedence argmax as the marker variant.
    //    Narrow codegen'd scan — trigram extraction shared with the
    //    text-index component.
    sql("llm_text_langid_ngram",
      """WITH tris AS (
        |  SELECT doc_id, lang,
        |         list_distinct([substring(lower(text), i, 3)
        |                        for i in range(1, length(text) - 1)]) AS tg
        |  FROM documents
        |), scores AS (
        |  SELECT doc_id, lang,
        |    len(list_intersect(tg, ['the','ing','ion','and','ent'])) AS s_en,
        |    len(list_intersect(tg, ['der','sch','ein','ich','und'])) AS s_de,
        |    len(list_intersect(tg, ['que','los','ado','cio','nte'])) AS s_es,
        |    len(list_intersect(tg, ['les','des','eur','ais','oir'])) AS s_fr
        |  FROM tris
        |)
        |SELECT doc_id, lang, s_en, s_de, s_es, s_fr,
        |       CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
        |            WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
        |            WHEN s_es >= s_fr THEN 'es'
        |            ELSE 'fr' END AS predicted
        |FROM scores ORDER BY doc_id""")(
      (s, d) => {
        def score(tg: Column, profile: Seq[String]): Column =
          size(array_intersect(tg, typedLit(profile))).cast("long")
        val scored = t(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            graft.query.TextIndex.trigrams(col("text")).as("tg"))
          .select(col("doc_id"), col("lang"),
            score(col("tg"), Seq("the", "ing", "ion", "and", "ent")).as("s_en"),
            score(col("tg"), Seq("der", "sch", "ein", "ich", "und")).as("s_de"),
            score(col("tg"), Seq("que", "los", "ado", "cio", "nte")).as("s_es"),
            score(col("tg"), Seq("les", "des", "eur", "ais", "oir")).as("s_fr"))
        scored.withColumn("predicted",
            when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
              col("s_en") >= col("s_fr"), "en")
              .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
              .when(col("s_es") >= col("s_fr"), "es")
              .otherwise("fr"))
          // persist before the global sort: the range sampler otherwise
          // re-executes the uncached tail (r14 recipe)
          .transform(graft.core.Caching.persistOnce)
          .orderBy("doc_id")
      }),

    // ── Quality scoring: length / punctuation / stopword-ratio features
    //    + composite score; all exact-integer ratios (engine-identical).
    sql("llm_text_quality",
      """WITH f AS (
        |  SELECT doc_id,
        |         length(text) AS n_chars,
        |         len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens,
        |         len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct,
        |         len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |             x -> x IN ('the','a','of','and','to','in','is'))) AS n_stop
        |  FROM documents
        |)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |       CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(n_punct AS BIGINT) AS n_punct,
        |       CAST(n_stop AS BIGINT) AS n_stop,
        |       CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
        |       CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
        |       CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_len,
        |       0.5 * (CAST(n_stop AS DOUBLE) / n_tokens)
        |         + 0.5 * (1.0 - CAST(n_punct AS DOUBLE) / n_chars) AS quality
        |FROM f ORDER BY doc_id""")(
      (s, d) => {
        val stops = Seq("the", "a", "of", "and", "to", "in", "is")
        val f = t(s, d, "documents")
          .select(col("doc_id"), col("text"), Text.tokens(col("text")).as("tk"))
          .select(
            col("doc_id"),
            length(col("text")).cast("long").as("n_chars"),
            size(col("tk")).cast("long").as("n_tokens"),
            graft.llmops.Text.nonAlnumCount(col("text")).cast("long").as("n_punct"),
            size(filter(col("tk"), x => x.isInCollection(stops)))
              .cast("long").as("n_stop"))
        f.select(col("doc_id"), col("n_chars"), col("n_tokens"), col("n_punct"),
            col("n_stop"),
            (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
            (col("n_punct").cast("double") / col("n_chars")).as("punct_ratio"),
            (col("n_chars").cast("double") / col("n_tokens")).as("avg_token_len"),
            (lit(0.5) * (col("n_stop").cast("double") / col("n_tokens")) +
              lit(0.5) * (lit(1.0) -
                col("n_punct").cast("double") / col("n_chars"))).as("quality"))
          .orderBy("doc_id")
      }),

    // ── Token counting: whitespace + BPE-ish regex segmentation.
    sql("llm_text_tokens",
      """SELECT doc_id,
        |       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |            ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |         AS BIGINT) AS n_ws,
        |       CAST(len(regexp_extract_all(lower(text),
        |           '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe
        |FROM documents ORDER BY doc_id""")(
      (s, d) => t(s, d, "documents").select(
          col("doc_id"),
          when(length(trim(col("text"))) === 0, 0)
            .otherwise(size(split(trim(col("text")), "\\s+")))
            .cast("long").as("n_ws"),
          regexp_count(lower(col("text")),
            lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long").as("n_bpe"))
        // persist before the global sort: the range sampler otherwise
        // re-executes the uncached tail (r14 recipe)
        .transform(graft.core.Caching.persistOnce)
        .orderBy("doc_id")),

    // ── Tokenizer-fertility sheet per language: pooled chars/token
    //    (the fertility proxy a tokenizer eval reads first), tokens/doc,
    //    and vocabulary size with its reuse ratio. Every double divides
    //    pooled integer sums — no cross-row float math. Scale shape: the
    //    doc-level stats ride the shared tokenArrays cache (one
    //    map-side-combined shuffle on lang); the vocabulary needs its
    //    own distinct-token aggregation — count_distinct inside the same
    //    lang exchange — and the two lang-keyed results join broadcast.
    sql("llm_token_fertility",
      """WITH toks AS (
        |  SELECT doc_id, lang, n_chars,
        |         regexp_split_to_array(trim(lower(text)), '\s+') AS tk
        |  FROM documents WHERE length(trim(text)) > 0
        |), per AS (
        |  SELECT lang, count(*) AS n_docs, SUM(len(tk)) AS n_tokens,
        |         SUM(n_chars) AS sum_chars
        |  FROM toks GROUP BY lang
        |), voc AS (
        |  SELECT lang, count(DISTINCT tok) AS vocab
        |  FROM (SELECT lang, unnest(tk) AS tok FROM toks) GROUP BY lang
        |)
        |SELECT p.lang, CAST(p.n_docs AS BIGINT) AS n_docs,
        |       CAST(p.n_tokens AS BIGINT) AS n_tokens,
        |       CAST(p.sum_chars AS DOUBLE) / p.n_tokens AS chars_per_token,
        |       CAST(p.n_tokens AS DOUBLE) / p.n_docs AS tokens_per_doc,
        |       CAST(v.vocab AS BIGINT) AS vocab,
        |       CAST(p.n_tokens AS DOUBLE) / v.vocab AS reuse
        |FROM per p JOIN voc v ON v.lang = p.lang
        |ORDER BY p.lang""")(
      (s, d) => {
        // lang/n_chars ride the shared token cache — no documents re-join
        val tk = tokenArrays(s, d)
        val per = tk.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(size(col("tk")).cast("long")).as("n_tokens"),
          sum(col("n_chars")).as("sum_chars"))
        val voc = tk.select(col("lang"), explode(col("tk")).as("tok"))
          .groupBy("lang").agg(countDistinct(col("tok")).as("vocab"))
        per.join(broadcast(voc), "lang")
          .select(col("lang"), col("n_docs"), col("n_tokens"),
            (col("sum_chars").cast("double") / col("n_tokens"))
              .as("chars_per_token"),
            (col("n_tokens").cast("double") / col("n_docs"))
              .as("tokens_per_doc"),
            col("vocab"),
            (col("n_tokens").cast("double") / col("vocab")).as("reuse"))
          // lang-cardinality result: persist-then-sort (see
          // QueryDef.sortedRollup) so the range sampler reads the cached
          // rollup instead of re-executing both aggregation legs
          .transform(QueryDef.sortedRollup(_, "lang"))
      }),

    // ── BPE tokenizer TRAINING, first three merge steps (Sennrich et
    //    al. 2016) — the "count adjacent pairs → merge the winner" loop
    //    behind every production tokenizer, run distributed by
    //    [[graft.llmops.Bpe]]: training state is the WORD-FREQUENCY
    //    table (100 TB of text folds to its distinct words in one
    //    map-side-combined count), each step is one vocabulary-sized
    //    pair-count shuffle + a 1-row best-pair collect + a fully
    //    NARROW greedy merge (per-word array folds; the a==b run rule
    //    rides the fold's last-merged position). Ties break (count
    //    desc, pair asc), so the merge table is deterministic; the
    //    oracle unrolls three steps with an equivalent run-parity
    //    window phrasing of the same greedy semantics.
    sql("llm_bpe_merges",
      s"""WITH $BpeCtes
        |SELECT CAST(1 AS BIGINT) AS step, pair, CAST(cnt AS BIGINT) AS cnt
        |FROM b1
        |UNION ALL SELECT 2, pair, CAST(cnt AS BIGINT) FROM b2
        |UNION ALL SELECT 3, pair, CAST(cnt AS BIGINT) FROM b3
        |ORDER BY step""")(
      (s, d) => {
        import s.implicits._
        val merges = graft.llmops.Bpe.trainCached(
          bpeWords(s, d), s"bpe:$d", 3)
        merges.zipWithIndex
          .map { case (m, i) => (i + 1L, m.pair, m.count) }
          .toDF("step", "pair", "cnt")
          .orderBy("step")
      }),

    // ── BPE ENCODING under the trained tokenizer: every document's
    //    token count after the 3 trained merges — the fertility sheet a
    //    tokenizer eval reads, produced at CORPUS scale without ever
    //    re-segmenting documents: the merges were trained on the
    //    word-frequency table, so the post-merge symbol count of every
    //    DISTINCT word is already known (3 narrow vocab passes), and
    //    each document just sums its tokens' counts through one
    //    vocab-sized join. The oracle reuses the training CTE chain's
    //    final state s3 the same way.
    sql("llm_bpe_encode",
      s"""WITH $BpeCtes,
        |wl AS (
        |  SELECT w, len(regexp_split_to_array(seq, ' ')) AS n_sym FROM s3
        |), doctok AS (
        |  SELECT doc_id,
        |         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
        |  FROM documents WHERE length(trim(text)) > 0
        |)
        |SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       CAST(SUM(length(d.w)) AS BIGINT) AS n_chars,
        |       CAST(SUM(wl.n_sym) AS BIGINT) AS n_bpe,
        |       CAST(SUM(wl.n_sym) AS DOUBLE) / COUNT(*) AS fertility
        |FROM doctok d JOIN wl ON wl.w = d.w
        |GROUP BY d.doc_id ORDER BY d.doc_id""")(
      (s, d) => {
        val words = bpeWords(s, d)
        val merges = graft.llmops.Bpe.trainCached(words, s"bpe:$d", 3)
        var state = graft.llmops.Bpe.initState(words)
        merges.foreach { m =>
          val Array(a, b) = m.pair.split(" ", 2)
          state = graft.llmops.Bpe.applyMerge(state, a, b)
        }
        val wl = state.select(col("w"),
          size(split(col("seq"), " ")).as("n_sym"))
        tokenArrays(s, d)
          .select(col("doc_id"), explode(col("tk")).as("w"))
          .join(wl, Seq("w"))
          .groupBy("doc_id").agg(
            count(lit(1)).as("n_tokens"),
            sum(length(col("w"))).cast("long").as("n_chars"),
            sum("n_sym").cast("long").as("n_bpe"))
          .withColumn("fertility",
            col("n_bpe").cast("double") / col("n_tokens"))
          // persist before the global sort: the range sampler otherwise
          // re-executes the uncached tail (r14 recipe)
          .transform(graft.core.Caching.persistOnce)
          .orderBy("doc_id")
      }),

    // ── Document fingerprint: canonicalized (sorted distinct token set)
    //    content hash + cluster sizes.
    sql("llm_text_fingerprint",
      """WITH fp AS (
        |  SELECT doc_id,
        |         md5(array_to_string(list_sort(list_distinct(
        |           regexp_split_to_array(trim(lower(text)), '\s+'))), ' '))
        |           AS fingerprint
        |  FROM documents
        |)
        |SELECT doc_id, fingerprint,
        |       count(*) OVER (PARTITION BY fingerprint) AS cluster_n
        |FROM fp ORDER BY doc_id""")(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        t(s, d, "documents")
          .select(col("doc_id"),
            md5(array_join(sort_array(array_distinct(Text.tokens(col("text")))),
              " ")).as("fingerprint"))
          .withColumn("cluster_n",
            count(lit(1)).over(Window.partitionBy("fingerprint")))
          .orderBy("doc_id")
      }),

    // ── PII detection + redaction: regex detectors (email, phone) with
    //    counts and a redacted payload. The synthetic corpus contains no
    //    PII, so a deterministic contact suffix derived from doc_id is
    //    appended first — both engines see the identical payload. Pure
    //    codegen'd row expressions; at 100 TB this is a narrow scan.
    sql("llm_text_pii",
      """WITH p AS (
        |  SELECT doc_id,
        |         text || ' contact: user' || CAST(doc_id AS VARCHAR) ||
        |         '@example.com tel +1-555-' ||
        |         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS payload
        |  FROM documents
        |)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(payload,
        |         '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT)
        |         AS n_emails,
        |       CAST(len(regexp_extract_all(payload,
        |         '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
        |       md5(regexp_replace(regexp_replace(payload,
        |         '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |         '\+1-555-[0-9]{4}', '[PHONE]', 'g')) AS redacted_sig
        |FROM p ORDER BY doc_id""")(
      (s, d) => {
        val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
        val phoneRe = "\\+1-555-[0-9]{4}"
        t(s, d, "documents")
          .select(col("doc_id"),
            concat(col("text"), lit(" contact: user"),
              col("doc_id").cast("string"), lit("@example.com tel +1-555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
              .as("payload"))
          .select(col("doc_id"),
            regexp_count(col("payload"), lit(emailRe)).cast("long").as("n_emails"),
            regexp_count(col("payload"), lit(phoneRe)).cast("long").as("n_phones"),
            md5(regexp_replace(
              regexp_replace(col("payload"), emailRe, "[EMAIL]"),
              phoneRe, "[PHONE]")).as("redacted_sig"))
          // persist the NARROW result before the global sort: the range
          // sampler otherwise re-runs the 4-regex pass over the payload
          // (the dominant cost) a second time; the cached frame is
          // (id + 2 longs + md5), not the payload
          .transform(graft.core.Caching.persistOnce)
          .orderBy("doc_id")
      }),

    // ── Winnowing-style rolling-hash fingerprint: per-doc minimum and
    //    bottom-3 of the 3-gram window hashes (the standard bottom-k
    //    sketch used for plagiarism-style containment). Reuses the
    //    cached distinct gram-hash table — marginal cost is one small
    //    groupBy.
    sql("llm_text_winnow",
      s"""WITH $ShingleCtes, ghd AS (
        |  SELECT DISTINCT doc_id, g FROM gh
        |)
        |SELECT doc_id, CAST(MIN(g) AS BIGINT) AS min_hash,
        |       array_to_string(list_slice(list(g ORDER BY g), 1, 3), ',')
        |         AS bottom3
        |FROM ghd GROUP BY doc_id ORDER BY doc_id""")(
      (s, d) => docGramStats(s, d)
        // the per-doc set is already sorted ascending — the sketch is a
        // narrow projection, zero shuffles
        .select(col("doc_id"),
          element_at(col("gs"), 1).cast("long").as("min_hash"),
          array_join(slice(col("gs"), 1, 3), ",").as("bottom3"))
        .orderBy("doc_id")),

    // ── Multimodal frame sampling: one payload row → N frame-grain rows
    //    (the video-decoder shape: narrow flatMap, batch-local work, no
    //    shuffle; decode stubbed as even byte-range fingerprints). The
    //    oracle slices the VARCHAR — identical to the binary path because
    //    the corpus is ASCII (byte offsets == char offsets).
    sql("llm_mm_frames",
      """WITH m AS (
        |  SELECT doc_id, source AS kind, text,
        |         length(text) AS len,
        |         CAST(length(text) % 7 + 1 AS INT) AS n
        |  FROM documents
        |)
        |SELECT doc_id, kind, CAST(k AS INT) AS frame_idx,
        |       md5(substring(text, CAST((len * k) // n AS INT) + 1,
        |           CAST((len * (k + 1)) // n AS INT)
        |             - CAST((len * k) // n AS INT))) AS frame_sig
        |FROM m CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS k)
        |WHERE k < n
        |ORDER BY doc_id, frame_idx""")(
      (s, d) => graft.core.Caching.persistOnce(
          // persist before the global sort: the range sampler otherwise
          // re-executes the whole per-frame md5 flatMap (same recipe as
          // llm_mm_audio below)
          Multimodal.sampleFramesDF(
            t(s, d, "documents").select(col("doc_id"),
              col("source").as("kind"), col("text").cast("binary").as("media"))))
        .orderBy("doc_id", "frame_idx")),

    // ── Multimodal AUDIO segmentation: payload + sample-rate metadata →
    //    overlapping fixed-size segments (the ASR/audio-LM training
    //    grain): window rate/100 bytes, hop 3·rate/400 (75% overlap
    //    framing), per-segment fingerprint. Decode stubbed to byte math
    //    (codec-free container) but the typed plumbing — metadata-driven
    //    geometry, one row → N rows, batch-local flatMap, no shuffle —
    //    is real and the expansion is oracle-exact (ASCII corpus: byte
    //    offsets == char offsets).
    sql("llm_mm_audio",
      """WITH m AS (
        |  SELECT doc_id, text, length(text) AS len,
        |         CAST(8000 + (doc_id % 3) * 4000 AS INT) AS rate
        |  FROM documents WHERE length(text) > 0
        |), p AS (
        |  SELECT doc_id, text, len, rate,
        |         rate // 100 AS seg, 3 * rate // 400 AS hop,
        |         (len - 1) // (3 * rate // 400) + 1 AS n
        |  FROM m
        |), f AS (
        |  SELECT doc_id, rate, text, len, seg, hop,
        |         unnest(range(0, n)) AS k
        |  FROM p
        |)
        |SELECT doc_id, rate AS sample_rate, CAST(k AS INT) AS seg_idx,
        |       CAST(k * hop AS BIGINT) AS start_byte,
        |       CAST(least(seg, len - k * hop) AS BIGINT) AS seg_bytes,
        |       md5(substring(text, CAST(k * hop AS INT) + 1,
        |           CAST(least(seg, len - k * hop) AS INT))) AS seg_sig
        |FROM f ORDER BY doc_id, seg_idx""")(
      (s, d) => graft.core.Caching.persistOnce(Multimodal.segmentAudioDF(
          t(s, d, "documents").filter(length(col("text")) > 0)
            .select(col("doc_id"), col("text").cast("binary").as("media"),
              (lit(8000) + (col("doc_id") % 3) * 4000).cast("int")
                .as("sample_rate"))))
        // persist before the global sort: the range sampler otherwise
        // re-executes the whole typed segmentation (per-segment md5s)
        .orderBy("doc_id", "seg_idx")),

    // ── Multimodal RESIZE: the fourth plumbing verb (decode / extract /
    //    resize / sample) — metadata-driven 1-D nearest-neighbor
    //    downsample keeping every scale-th byte, size contract
    //    ceil(len/scale), output fingerprinted. Narrow typed map, batch
    //    local; the oracle rebuilds the sampled string positionally.
    sql("llm_mm_resize",
      """WITH m AS (
        |  SELECT doc_id, text, length(text) AS len,
        |         CAST(doc_id % 3 + 2 AS INT) AS scale
        |  FROM documents WHERE length(text) > 0
        |)
        |SELECT doc_id, scale,
        |       CAST(len AS BIGINT) AS in_bytes,
        |       CAST((len - 1) // scale + 1 AS BIGINT) AS out_bytes,
        |       md5(array_to_string(
        |         [substring(text, CAST(1 + i * scale AS INT), 1)
        |          for i in range(0, (len - 1) // scale + 1)], ''))
        |         AS out_sig
        |FROM m ORDER BY doc_id""")(
      (s, d) => Multimodal.resizeDF(
          t(s, d, "documents").filter(length(col("text")) > 0)
            .select(col("doc_id"), col("text").cast("binary").as("media"),
              (col("doc_id") % 3 + 2).cast("int").as("scale")))
        .orderBy("doc_id")),

    // ── Multimodal plumbing: binary payload + metadata → batched
    //    mapPartitions feature extraction (decode stubbed, deterministic).
    sql("llm_mm_features",
      """SELECT doc_id, source AS kind,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       md5(text) AS sig,
        |       CAST(octet_length(encode(text)) % 7 + 1 AS INTEGER) AS frames
        |FROM documents ORDER BY doc_id""")(
      (s, d) => Multimodal.extractFeaturesDF(
          t(s, d, "documents").select(col("doc_id"), col("source").as("kind"),
            col("text").cast("binary").as("media")))
        .orderBy("doc_id")),

    // ── Multimodal NEAR-DUP (perceptual hash): the image-dedup shape —
    //    per-payload 64-bit average-hash packed as 4 × 16-bit bands
    //    (decode stubbed to the resize stub's byte sampling; see
    //    Multimodal.aHashStub), banded equi-join for candidates with the
    //    SkewGuard star cap, exact hamming verify on candidates only.
    //    Candidate recall contract: pigeonhole guarantees every pair
    //    within hamming 3 shares a band; pairs 4..10 surface only on a
    //    band collision (standard banded-LSH semantics, same contract
    //    family as llm_dedup_minhash). No all-pairs join at any scale:
    //    pair volume is Σ_cell O(cell²) under the cap, O(cell) above it.
    sql("llm_mm_phash",
      s"""WITH $MmPhashCtes
        |SELECT a_id, b_id, CAST(hamming AS BIGINT) AS hamming
        |FROM mmdup ORDER BY a_id, b_id""")(
      (s, d) => mmPhashPairs(s, d)
        // persist before the global sort (r14 recipe)
        .transform(graft.core.Caching.persistOnce)
        .orderBy("a_id", "b_id")),

    // ── Image-dedup CLUSTERS + keep-list: the step a media pipeline
    //    actually consumes after pair generation — connected components
    //    over the perceptual-hash pair graph, min-id canonical per
    //    cluster, per-doc keeper flag (the phash analog of
    //    llm_dedup_components + llm_dedup_apply). Spark: min-label
    //    propagation on the PAIR graph only (pairs ≪ corpus); docs with
    //    no near-twin never enter the component computation at all.
    sql("llm_mm_phash_cluster",
      s"""WITH RECURSIVE $MmPhashCtes, edges AS (
        |  SELECT a_id AS u, b_id AS v FROM mmdup
        |  UNION ALL SELECT b_id, a_id FROM mmdup
        |), closure(src, dst) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT c.src, e.v FROM closure c JOIN edges e ON c.dst = e.u
        |), comp AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        |  FROM closure GROUP BY src
        |), sized AS (
        |  SELECT cluster_id, count(*) AS cluster_size FROM comp
        |  GROUP BY cluster_id
        |)
        |SELECT c.doc_id, CAST(c.cluster_id AS BIGINT) AS cluster_id,
        |       CAST(s.cluster_size AS BIGINT) AS cluster_size,
        |       (c.doc_id = c.cluster_id) AS is_keeper
        |FROM comp c JOIN sized s USING (cluster_id)
        |ORDER BY c.doc_id""")(
      (s, d) => {
        val labels = componentLabels(s,
          mmPhashPairs(s, d).select("a_id", "b_id"))
        val sizes = labels.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
        labels.join(sizes, "comp")
          .select(col("node").as("doc_id"), col("comp").as("cluster_id"),
            col("cluster_size"),
            (col("node") === col("comp")).as("is_keeper"))
          .orderBy("doc_id")
      })
  )

  /** Shared perceptual-hash oracle chain: payload byte sampling → 4 ×
    * 16-bit aHash bands → SkewGuard-capped banded candidates → exact
    * hamming verify, ending in `mmdup(a_id, b_id, hamming ≤ 10)`.
    * Consumed by llm_mm_phash (pair listing) and llm_mm_phash_cluster
    * (components). */
  private def MmPhashCtes: String =
    s"""m AS (
       |  SELECT doc_id, text, length(text) AS len
       |  FROM documents WHERE length(text) >= 64
       |), sb AS (
       |  SELECT doc_id,
       |         [ascii(substring(text, CAST((len * i) // 64 AS INT) + 1, 1))
       |          for i in range(0, 64)] AS s
       |  FROM m
       |), ph AS (
       |  SELECT doc_id, s, list_sum(s) // 64 AS mean FROM sb
       |), bands AS (
       |  SELECT doc_id,
       |         list_sum([CASE WHEN s[b + 1]  > mean THEN 1 << b ELSE 0 END
       |                   for b in range(0, 16)]) AS b0,
       |         list_sum([CASE WHEN s[b + 17] > mean THEN 1 << b ELSE 0 END
       |                   for b in range(0, 16)]) AS b1,
       |         list_sum([CASE WHEN s[b + 33] > mean THEN 1 << b ELSE 0 END
       |                   for b in range(0, 16)]) AS b2,
       |         list_sum([CASE WHEN s[b + 49] > mean THEN 1 << b ELSE 0 END
       |                   for b in range(0, 16)]) AS b3
       |  FROM ph
       |), rows0 AS (
       |  SELECT doc_id, 0 AS j, b0 AS band FROM bands UNION ALL
       |  SELECT doc_id, 1, b1 FROM bands UNION ALL
       |  SELECT doc_id, 2, b2 FROM bands UNION ALL
       |  SELECT doc_id, 3, b3 FROM bands
       |), ${graft.llmops.SkewGuard.oracleCandSql(
            "rows0", Seq("j", "band"), "doc_id", "a_id", "b_id")}, h AS (
       |  SELECT c.a_id, c.b_id,
       |         bit_count(xor(ba.b0, bb.b0)) + bit_count(xor(ba.b1, bb.b1)) +
       |         bit_count(xor(ba.b2, bb.b2)) + bit_count(xor(ba.b3, bb.b3))
       |           AS hamming
       |  FROM cand c JOIN bands ba ON ba.doc_id = c.a_id
       |              JOIN bands bb ON bb.doc_id = c.b_id
       |), mmdup AS (
       |  SELECT a_id, b_id, hamming FROM h WHERE hamming <= 10
       |)""".stripMargin

  /** Perceptual-hash near-dup pairs `(a_id, b_id, hamming)` — the Spark
    * twin of [[MmPhashCtes]], memoized per (session, corpus) since both
    * the pair listing and the cluster query consume it.
    *
    * Plan shape: the hash pass is the codegen twin of the batched
    * decode contract (ASCII corpus needs no decode; binary media would
    * swap in `Multimodal.aHashDF`, same band schema). The full hash is
    * only 4 shorts, so the band rows CARRY it through the capped
    * self-join (`SkewGuard.cellPairs(carryCols)`) — the hamming verify
    * is then a per-row expression on the pairs: no join-back stage, no
    * second scan of the hash table, nothing broadcast. (The minhash /
    * gram-set verifies keep the join-back path — their payloads are
    * corpus-scale arrays that must not ride 16 band rows per doc.) */
  private[registry] def mmPhashPairs(s: SparkSession, d: String): DataFrame =
    Caching.memoDfEpoch(s, s"mmPhashPairs:$d") {
      val hashes = Multimodal.aHashBands(
        t(s, d, "documents").filter(length(col("text")) >= 64)
          .select(col("doc_id"), col("text")))
        .select("doc_id", "b0", "b1", "b2", "b3")
      val bandRows = hashes.select(
          col("doc_id") +: col("b0") +: col("b1") +: col("b2") +: col("b3") +:
            Seq(explode(array((0 until 4).map(j => struct(lit(j).as("j"),
              col(s"b$j").as("band"))): _*)).as("e")): _*)
        .select(col("doc_id"), col("e.j").as("j"), col("e.band").as("band"),
          col("b0"), col("b1"), col("b2"), col("b3"))
      val ham = (0 until 4).map(j =>
        bit_count(col(s"a_b$j").bitwiseXOR(col(s"b_b$j")))).reduce(_ + _)
      graft.llmops.SkewGuard
        .cellPairs(bandRows, Seq("j", "band"), "doc_id",
          carryCols = Seq("b0", "b1", "b2", "b3"))
        .dropDuplicates("a_id", "b_id")
        .withColumn("hamming", ham.cast("long"))
        .filter(col("hamming") <= 10)
        .select("a_id", "b_id", "hamming")
    }
}
