package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016): iterate
  * "count adjacent symbol pairs → merge the most frequent". The classic
  * trainer is a single-machine loop over a word-frequency dictionary;
  * the distributed shape keeps exactly that state — training runs on
  * the WORD FREQUENCY table (vocabulary-scale, not corpus-scale: 100 TB
  * of text folds to its distinct words in one map-side-combined count)
  * — and each iteration is
  *   - one pair-count aggregation (vocabulary-sized shuffle with
  *     map-side combine),
  *   - a 1-row best-pair collect (driver-sized by construction),
  *   - a NARROW merge application: greedy left-to-right pair merging
  *     per word as array folds (no shuffle at all — the overlap rule
  *     for runs of a repeated symbol rides the fold's last-merged
  *     position, Spark's codegen'd higher-order functions throughout).
  *
  * Ties on count break by pair string ascending, so training is fully
  * deterministic — the DuckDB oracle reproduces the merge table
  * bit-for-bit via an equivalent relational phrasing (run-parity window
  * over hit positions = the same greedy semantics).
  */
object Bpe {

  /** One chosen merge: the pair (two symbols, space-separated) and its
    * occurrence count at selection time. */
  final case class Merge(pair: String, count: Long)

  /** Initial trainer state from a word-frequency table `(w, freq)`:
    * each word as its space-joined character sequence. (Symbols never
    * contain spaces, so ' ' is a safe separator.) */
  def initState(words: DataFrame): DataFrame =
    words.select(col("w"), col("freq"),
      trim(regexp_replace(col("w"), "(.)", "$1 ")).as("seq"))

  /** Adjacent-pair occurrence counts over the state, weighted by word
    * frequency (overlapping adjacencies count, per standard BPE). */
  def pairCounts(state: DataFrame): DataFrame = {
    val tk = split(col("seq"), " ")
    val pairs = when(size(tk) >= 2,
      transform(sequence(lit(0), size(tk) - 2), i =>
        concat_ws(" ", element_at(tk, i + 1), element_at(tk, i + 2))))
      .otherwise(array().cast("array<string>"))
    state.select(col("freq"), explode(pairs).as("pair"))
      .groupBy("pair").agg(sum("freq").as("cnt"))
  }

  /** Greedy left-to-right application of one merge `(a, b) → ab` to
    * every word — entirely narrow: hit positions, the greedy keep-set
    * (skip a hit that immediately follows a merged hit — the a==b run
    * rule), and the rebuilt sequence are per-row array folds. */
  def applyMerge(state: DataFrame, a: String, b: String): DataFrame = {
    val merged = a + b
    val tk = split(col("seq"), " ")
    // 0-based positions whose (sym, next) matches the pair
    val hitPos = when(size(tk) >= 2,
      filter(sequence(lit(0), size(tk) - 2), i =>
        element_at(tk, i + 1) === a && element_at(tk, i + 2) === b))
      .otherwise(array().cast("array<int>"))
    // greedy: merge a hit unless it starts right after a merged hit
    val mergeAt = aggregate(
      hitPos,
      struct(lit(-2).cast("int").as("last"),
        array().cast("array<int>").as("ms")),
      (acc, p) => when(p > acc.getField("last") + 1,
        struct(p.cast("int").as("last"),
          concat(acc.getField("ms"), array(p.cast("int"))).as("ms")))
        .otherwise(acc),
      acc => acc.getField("ms"))
    val rebuilt = array_join(
      filter(
        transform(sequence(lit(0), size(tk) - 1), i =>
          when(array_contains(mergeAt, i.cast("int")), lit(merged))
            .when(array_contains(mergeAt, (i - 1).cast("int")), lit(null))
            .otherwise(element_at(tk, i + 1))),
        x => x.isNotNull),
      " ")
    state.select(col("w"), col("freq"), rebuilt.as("seq"))
  }

  // trained merge tables per cache key — a production pipeline trains
  // the tokenizer ONCE per corpus and persists the merge table beside
  // it; re-deriving it on every consumer would be re-training per query
  // (same persistence rationale as the PQ codebook cache)
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Seq[Merge]]()

  /** [[train]] memoized on `cacheKey` (e.g. the corpus path). */
  def trainCached(words: => DataFrame, cacheKey: String, steps: Int)
      : Seq[Merge] =
    mergeCache.computeIfAbsent((cacheKey, steps), _ => train(words, steps))

  /** Train `steps` merges over the `(w, freq)` word-frequency table.
    * Returns the ordered merge table. Each step's lineage is cut with
    * a localCheckpoint so long trainings don't accrete a deep plan. */
  def train(words: DataFrame, steps: Int): Seq[Merge] = {
    var state = initState(words)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 0
    var exhausted = false
    while (step < steps && !exhausted) {
      step += 1
      val best = pairCounts(state)
        .orderBy(col("cnt").desc, col("pair")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        merges += Merge(pair, best(0).getLong(1))
        val Array(a, b) = pair.split(" ", 2)
        // checkpoint EVERY step: the next iteration's count action
        // would otherwise recompute the whole merge chain from the raw
        // words (step k pays k-1 replays), and the state is only
        // vocabulary-sized — the checkpoint is cheap and also bounds
        // plan depth for long trainings
        state = applyMerge(state, a, b).localCheckpoint()
      }
    }
    merges.toSeq
  }
}
