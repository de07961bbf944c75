package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the dedup / text-analysis operators.
  *
  * Everything is a pure Catalyst expression (whole-stage codegen; no
  * UDFs), deterministic, and exactly mirrorable in ANSI SQL — which is
  * what lets every operator built on these be DuckDB-oracle-verified.
  */
object Text {

  /** Whitespace tokens of the lower-cased, trimmed text. */
  /** Whitespace tokens of `trim(lower(text))` — served by the codegen
    * byte-pass kernel ([[graft.functions.GraftFunctions.TokensExpr]]);
    * the regex form below is the spec-pinned reference. This is the
    * hottest expression in the engine (every gram/LM/quality/DSIR
    * build starts here), and the regex split paid a Pattern walk per
    * row (~10× the kernel's cost; visible as the llm_text_quality /
    * llm_mix_quality sf1 growth in SCALE_r13). */
  def tokens(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.GraftFunctions.TokensExpr(
      GraftColumnBridge.expression(text)))
  }

  /** Regex reference form of [[tokens]] (TokensExprSpec fuzzes the
    * kernel against it). */
  private[llmops] def tokensRegex(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Count of code points outside `[a-zA-Z0-9 ]` — the codegen twin of
    * `regexp_count(text, "[^a-zA-Z0-9 ]")` (the quality-feature punct
    * count; kernel-fuzzed against the regex form). */
  def nonAlnumCount(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.GraftFunctions
      .NonAlnumCountExpr(GraftColumnBridge.expression(text)))
  }

  /** Whitespace token COUNT with the empty-document guard (split of ""
    * yields [""], not []) — the one definition every query family's
    * token accounting shares. */
  def nTokens(text: Column): Column =
    when(length(trim(text)) === 0, 0L)
      .otherwise(size(tokens(text)).cast("long"))

  /** [[hash60]] of each distinct word n-gram shingle, first-occurrence
    * order — `explode(shingles(tk)) → hash60(gram)` fused into one
    * codegen pass ([[graft.functions.GraftFunctions.ShingleHash60Expr]];
    * multiset/order identical, spec-fuzzed). The batch gram-cache
    * build rides this; consumers that need the shingle STRINGS keep
    * [[shingles]]. */
  def shingleHashes(toks: Column, n: Int = 3): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.GraftFunctions
      .ShingleHash60Expr(GraftColumnBridge.expression(toks), n))
  }

  /** [[hash60]] of the word n-gram at EVERY position (no dedup) — the
    * positional sibling of [[shingleHashes]] for the exact-substring
    * family; element i ≡ `hash60(concat_ws(' ', slice(tk, i + 1, n)))`. */
  def positionalShingleHashes(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.GraftFunctions
      .PositionalShingleHash60Expr(GraftColumnBridge.expression(toks), n))
  }

  /** Distinct word n-gram shingles; empty array for docs shorter than n. */
  def shingles(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))))
      .otherwise(array().cast("array<string>"))

  /** 60-bit stable hash of a string reduced into the Mersenne-ish field
    * used by the MinHash permutations. Built from md5 so the DuckDB
    * oracle can reproduce it bit-for-bit:
    * `CAST(('0x' || substring(md5(s),1,15)) AS BIGINT) % 2147483647`.
    * Served by the codegen'd [[graft.functions.GraftFunctions.Hash60Expr]]
    * — digest bytes straight to the long (the first 15 hex chars ARE
    * the first 60 bits), skipping the 32-char hex-string materialize +
    * 15-char re-parse the `conv(substring(md5(s)))` form pays per call
    * on the hottest per-token/per-gram path (bit-identity pinned by
    * TextSpec against the SQL form and hash60Value). */
  val HashP = 2147483647L // 2^31 - 1; keeps a*g+b inside signed 64-bit
  def hash60(s: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      graft.functions.GraftFunctions.Hash60Expr(GraftColumnBridge.expression(s)))
  }

  /** Driver-side twin of [[hash60]] — bit-identical for any input (the
    * index layer uses it to map a QUERY term to its postings shard
    * without a Spark job). */
  def hash60Value(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % HashP
  }
}
