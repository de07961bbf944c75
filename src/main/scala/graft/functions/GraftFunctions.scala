package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.llmops.Similarity

/** Custom Catalyst expressions for the hot numeric kernels.
  *
  * The higher-order-function formulations (`aggregate(zip_with(...))`)
  * are interpreted per element (~100 ns/op); these expressions run the
  * same arithmetic as tight JVM loops over the columnar `ArrayData`
  * (measured ~10× on the LSH bucket computation at sf0.1). Evaluation
  * order of every floating-point reduction is IDENTICAL to the HOF
  * sequential fold — and therefore to the DuckDB oracle — so swapping
  * them in changes nothing bit-wise.
  *
  * Every expression implements `doGenCode` (NOT CodegenFallback): the
  * generated code calls the same static kernel the interpreted path
  * uses, so the expression stays INSIDE whole-stage codegen. This
  * matters most in the O(n²) pair plans (nested-loop join → project):
  * a fallback expression forces the join output through interpreted
  * per-row dispatch exactly where the engine spends its time.
  *
  * Registered via the session FunctionRegistry and invoked with
  * `call_function`, so they also work from SQL.
  */
object GraftFunctions {

  /** Hyperplane components, precomputed once:
    * plane(i)(d) = (((i*131 + d) * 2654435761) mod 1000003)/1000003 - 0.5
    * (same formula as [[Similarity.planeComponent]]). */
  lazy val Planes: Array[Array[Double]] =
    Array.tabulate(Similarity.LshTables * Similarity.LshBits, 64) { (i, d) =>
      ((i.toLong * 131L + d) * 2654435761L % 1000003L).toDouble / 1000003.0 - 0.5
    }

  // ---- static kernels (one source for interpreted AND generated code) --

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5-derived hash (see [[graft.llmops.Text.hash60]]) computed
    * straight from the digest BYTES. Bit-identical to the SQL
    * formulation `conv(substring(md5(s),1,15),16,10) % 2147483647`:
    * the first 15 hex characters of the digest ARE its first 60 bits,
    * i.e. the big-endian first 8 bytes shifted right 4. The SQL path
    * materializes a 32-char hex string and re-parses 15 chars of it
    * per call — pure churn on the hottest per-token/per-gram path in
    * the gram-cache builds. */
  def hash60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = Md5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v >>> 4) % 2147483647L
  }

  /** Sign-bit LSH bucket per table over the precomputed hyperplanes. */
  def lshBuckets(input: ArrayData): ArrayData = {
    // toDoubleArray is one copy per call; acceptable here (one call per
    // corpus row, not per pair — the pairwise kernels below avoid it)
    val v = input.toDoubleArray()
    val tables = Similarity.LshTables
    val bits = Similarity.LshBits
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val plane = Planes(t * bits + b)
        var proj = 0.0
        var d = 0
        val n = math.min(v.length, plane.length)
        while (d < n) { proj += v(d) * plane(d); d += 1 }
        if (proj >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Cosine similarity over array<double>, reading `ArrayData` in place
    * (no per-call copy — this runs once per PAIR in nested-loop plans,
    * where a copy per call is 2× the array bytes in allocation alone).
    * The three inner products fold sequentially, exactly like the
    * HOF/oracle versions. */
  def cosineSim(a: ArrayData, b: ArrayData): Double = {
    val la = a.numElements(); val lb = b.numElements()
    val n = math.min(la, lb)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    i = 0
    while (i < la) { val x = a.getDouble(i); na += x * x; i += 1 }
    i = 0
    while (i < lb) { val x = b.getDouble(i); nb += x * x; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Plain sequential-fold dot product of two array<double> columns. */
  def dotProduct(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }

  /** Cosine similarity directly on int8 code arrays: exact integer
    * dot/norm accumulation (127²·dim ≪ 2⁶³), one double division. */
  def cosineSimQ8(a: ArrayData, b: ArrayData): Double = {
    val la = a.numElements(); val lb = b.numElements()
    val n = math.min(la, lb)
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) { dot += a.getByte(i).toLong * b.getByte(i); i += 1 }
    i = 0
    while (i < la) { val x = a.getByte(i).toLong; na += x * x; i += 1 }
    i = 0
    while (i < lb) { val x = b.getByte(i).toLong; nb += x * x; i += 1 }
    dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  /** Integer dot product of two int8 code arrays (long accumulator:
    * 127²·dim ≪ 2⁶³) — for plans that precompute per-code norms once
    * instead of re-deriving them per pair ([[cosineSimQ8]] folds all
    * three sums; at queries × corpus pair volume the two norm loops
    * are 2/3 of the kernel). */
  def dotQ8(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var i = 0
    while (i < n) { dot += a.getByte(i).toLong * b.getByte(i); i += 1 }
    dot
  }

  /** Ids of the `n` centroids nearest to `v` in EUCLIDEAN distance,
    * best first, ties to the lower id — the assignment rule product-
    * quantization codebooks need (sub-vector magnitude carries signal
    * that cosine assignment would discard). */
  def nearestCentroidsL2(v: ArrayData, m: ArrayData, n: Int): ArrayData = {
    val k = m.numElements()
    val d2 = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = m.getArray(c)
      val d = math.min(v.numElements(), cent.numElements())
      var acc = 0.0
      var i = 0
      while (i < d) {
        val t = v.getDouble(i) - cent.getDouble(i)
        acc += t * t
        i += 1
      }
      d2(c) = acc
      c += 1
    }
    val order = Array.range(0, k).sortBy(i => (d2(i), i))
    new GenericArrayData(order.take(math.min(n, k)))
  }

  /** Ids of the `n` centroids most cosine-similar to `v`, best first,
    * ties to the lower id. */
  def nearestCentroids(v: ArrayData, m: ArrayData, n: Int): ArrayData = {
    val k = m.numElements()
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = m.getArray(c)
      val d = math.min(v.numElements(), cent.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < d) {
        val x = v.getDouble(i); val y = cent.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      sims(c) = if (na == 0.0 || nb == 0.0) -2.0
                else dot / (math.sqrt(na) * math.sqrt(nb))
      c += 1
    }
    val order = Array.range(0, k).sortBy(i => (-sims(i), i))
    new GenericArrayData(order.take(math.min(n, k)))
  }

  /** One-pass symmetric int8 quantization: scale = max|x|/127, codes =
    * round_half_up(x/scale); zero vectors → scale 0, zero codes. */
  def quantize(a: ArrayData): InternalRow = {
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(a.getDouble(i)); if (x > maxAbs) maxAbs = x; i += 1
    }
    val scale = maxAbs / 127.0
    val out = new Array[Byte](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        val v = a.getDouble(i) / scale
        // HALF_UP away from zero, matching functions.round's BigDecimal
        // semantics on the values this sees (|v| ≤ 127)
        out(i) = (math.signum(v) * math.round(math.abs(v))).toByte
        i += 1
      }
    }
    InternalRow(scale, new GenericArrayData(out))
  }

  /** 64-sample average-hash bands over a byte payload (≥ 64 bytes):
    * element j = the 16 bits of band j. Identical math to
    * `llmops.Multimodal.aHashStub` (byte i·len/64 sampled, strict
    * greater-than the integer mean), but ONE O(64) pass per row —
    * the HOF/substring formulation walked the string's UTF-8 bytes
    * once per sample, O(64·len) per row. */
  def aHashBands(b: Array[Byte]): ArrayData = {
    val len = b.length
    val sb = new Array[Int](64)
    var sum = 0
    var i = 0
    while (i < 64) {
      val v = b(((len.toLong * i) / 64).toInt) & 0xff
      sb(i) = v; sum += v; i += 1
    }
    val mean = sum / 64
    val out = new Array[Int](4)
    var j = 0
    while (j < 4) {
      var acc = 0
      var k = 0
      while (k < 16) { if (sb(16 * j + k) > mean) acc |= (1 << k); k += 1 }
      out(j) = acc; j += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct character trigrams of `lower(s)`, first-occurrence order —
    * the O(len) kernel behind [[TrigramsExpr]]. The HOF form
    * (`array_distinct(transform(sequence(...), i => substr(i, 3)))`)
    * re-walks the string's UTF-8 bytes from position 0 on EVERY
    * `substr` call — O(len²) per evaluation, and CollapseProject
    * inlines the trigram array into every consumer expression, so the
    * langid scorer evaluated it four times per row (llm_text_langid_
    * ngram: 6.8 s at sf0.1, the suite's most expensive query under
    * full materialization). This walks the code points once and slices
    * byte ranges. Bit-identical to the HOF: lowercase via
    * `UTF8String.toLowerCase` (what `lower()` calls), code-point
    * positions (what `substr` counts), first-occurrence dedup order
    * (what `array_distinct` keeps). */
  def trigramsOf(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val t = s.toLowerCase
    val b = t.getBytes
    // code-point start offsets
    var n = 0
    var p = 0
    while (p < b.length) {
      val lead = b(p) & 0xFF
      p += (if (lead < 0x80) 1 else if (lead < 0xE0) 2
            else if (lead < 0xF0) 3 else 4)
      n += 1
    }
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](n + 1)
    var i = 0
    p = 0
    while (p < b.length) {
      offs(i) = p
      val lead = b(p) & 0xFF
      p += (if (lead < 0x80) 1 else if (lead < 0xE0) 2
            else if (lead < 0xF0) 3 else 4)
      i += 1
    }
    offs(n) = b.length
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var k = 0
    while (k + 3 <= n) {
      seen.add(org.apache.spark.unsafe.types.UTF8String
        .fromBytes(b, offs(k), offs(k + 3) - offs(k)))
      k += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }

  /** Sorted-bigram run statistics of a token array — the O(n log n)
    * kernel behind [[BigramRunsExpr]]: builds the n−1 adjacent-bigram
    * strings, sorts them (binary order — what `array_sort` uses for
    * strings), and folds run lengths in one pass. Replaces the
    * llm_quality_repetition `aggregate()` HOF fold, which is
    * interpreted per element with a struct allocation per step
    * (~2.5M Catalyst evals over the sf0.1 corpus ≈ 1 s; this kernel
    * does the same work in tens of ms). Returns (best run, #runs,
    * #length-1 runs) — bit-identical to the fold (same bigram
    * construction as `concat_ws(" ", a, b)`: null tokens are skipped,
    * not rendered). */
  def bigramRuns(tk: ArrayData): InternalRow = {
    import org.apache.spark.unsafe.types.UTF8String
    val n = tk.numElements()
    if (n < 2) return new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(Array[Any](0L, 0L, 0L))
    val space = UTF8String.fromString(" ")
    val bg = new Array[UTF8String](n - 1)
    var i = 0
    while (i < n - 1) {
      val a = tk.getUTF8String(i)
      val b = tk.getUTF8String(i + 1)
      bg(i) =
        if (a == null && b == null) UTF8String.EMPTY_UTF8
        else if (a == null) b
        else if (b == null) a
        else UTF8String.concat(a, space, b)
      i += 1
    }
    java.util.Arrays.sort(bg, (x: UTF8String, y: UTF8String) => x.compareTo(y))
    var best = 0L
    var nruns = 0L
    var singles = 0L
    var run = 0L
    i = 0
    while (i < bg.length) {
      if (i == 0 || !bg(i).equals(bg(i - 1))) {
        if (run == 1L) singles += 1L
        run = 1L
        nruns += 1L
      } else run += 1L
      if (run > best) best = run
      i += 1
    }
    if (run == 1L) singles += 1L
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, nruns, singles))
  }

  /** `split(trim(lower(s)), "\s+", -1)` as one byte-level pass — the
    * kernel behind [[TokensExpr]], the hottest path of the entire text
    * family (every gram cache, LM model, quality feature and DSIR
    * bucket build tokenizes first). The HOF form pays
    * lower→trim→`Pattern.split` (a regex engine walk plus a String[]
    * allocation) per row; this walks the UTF-8 bytes once. Exact
    * semantics replicated: lowercase via `UTF8String.toLowerCase`,
    * trim = leading/trailing 0x20 only (what Spark's `trim()` does),
    * separators = Java regex `\s` = {space, \t, \n, \x0B, \f, \r} (all
    * single-byte in UTF-8, so byte scanning is code-point safe),
    * leading/trailing separator runs yield empty tokens and the empty
    * string yields [""] — Java `split` with limit -1, fuzz-pinned by
    * TokensExprSpec. */
  def tokensOf(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val t = s.toLowerCase.trim()
    val b = t.getBytes
    if (b.length == 0)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    @inline def sep(x: Byte): Boolean =
      x == 32 || (x >= 9 && x <= 13)
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    if (sep(b(0))) out.add(UTF8String.EMPTY_UTF8)
    while (i < b.length) {
      while (i < b.length && sep(b(i))) i += 1
      if (i < b.length) {
        val start = i
        while (i < b.length && !sep(b(i))) i += 1
        out.add(UTF8String.fromBytes(b, start, i - start))
      }
    }
    if (sep(b(b.length - 1))) out.add(UTF8String.EMPTY_UTF8)
    new GenericArrayData(out.toArray)
  }

  /** Count of code points NOT in `[a-zA-Z0-9 ]` — the kernel behind
    * [[NonAlnumCountExpr]], replacing `regexp_count(text,
    * "[^a-zA-Z0-9 ]")` in the quality features (a full regex-engine
    * walk per row for a one-character class). Java regex character
    * classes match per CODE POINT, so multibyte sequences count once:
    * byte-level, every ASCII byte tests the class and every lead byte
    * (≥ 0xC0) counts as one always-matching code point; continuation
    * bytes are skipped. */
  def nonAlnumCount(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val b = s.getBytes
    var n = 0L
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xFF
      if (x < 0x80) {
        val ok = (x >= 'a' && x <= 'z') || (x >= 'A' && x <= 'Z') ||
          (x >= '0' && x <= '9') || x == ' '
        if (!ok) n += 1
        i += 1
      } else if (x >= 0xC0) {
        n += 1
        i += 1
      } else i += 1 // continuation byte
    }
    n
  }

  /** hash60 of each DISTINCT word n-gram shingle, first-occurrence
    * order — the fused kernel behind [[ShingleHash60Expr]]:
    * `transform(Text.shingles(tk)) → explode → hash60` collapsed into
    * one pass. The HOF chain pays, per shingle, three interpreted
    * `element_at`s + a `concat_ws` allocation, then an `array_distinct`
    * over the strings, a CACHED materialization of the string arrays
    * and a second projection hashing each exploded string. The kernel
    * concatenates token bytes once per shingle, dedups in insertion
    * order (array_distinct semantics) and hashes only the distinct
    * survivors — the gram-cache build is the dominant shared cost of
    * the whole dedup/profile family. Multiset + order of the emitted
    * hashes are IDENTICAL to the HOF chain (null tokens skipped like
    * concat_ws; hash collisions between distinct shingles produce the
    * same duplicate hashes either way). */
  def shingleHashes(tk: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val m = tk.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val space = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= m) {
      val parts = new java.util.ArrayList[UTF8String](2 * n - 1)
      var k = 0
      while (k < n) {
        val t = tk.getUTF8String(i + k)
        if (t != null) {
          if (!parts.isEmpty) parts.add(space)
          parts.add(t)
        }
        k += 1
      }
      seen.add(UTF8String.concat(parts.toArray(new Array[UTF8String](parts.size())): _*))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = hash60(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  /** hash60 of the word n-gram at EVERY position (no dedup) — the
    * positional sibling of [[shingleHashes]] for the exact-substring
    * family: element i is hash60 of the n-token window starting at
    * position i, byte-identical to
    * `hash60(concat_ws(' ', slice(tk, i + 1, n)))` (nulls skipped like
    * concat_ws). One pass, no per-gram String or per-position array
    * allocation in the plan. */
  def positionalShingleHashes(tk: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val m = tk.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val space = UTF8String.fromString(" ")
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i + n <= m) {
      val parts = new java.util.ArrayList[UTF8String](2 * n - 1)
      var k = 0
      while (k < n) {
        val t = tk.getUTF8String(i + k)
        if (t != null) {
          if (!parts.isEmpty) parts.add(space)
          parts.add(t)
        }
        k += 1
      }
      out(i) = hash60(UTF8String.concat(
        parts.toArray(new Array[UTF8String](parts.size())): _*))
      i += 1
    }
    new GenericArrayData(out)
  }

  private val Kernel = "graft.functions.GraftFunctions"

  // ---- expressions ----------------------------------------------------

  /** array<double> embedding → array<long>: element t is the sign-bit
    * bucket of LSH table t. */
  case class LshBucketsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      lshBuckets(input.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernel.lshBuckets($c)")
    override protected def withNewChildInternal(c: Expression): LshBucketsExpr =
      copy(c)
  }

  /** Cosine similarity of two array<double> columns (see [[cosineSim]]). */
  case class CosineSimExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      cosineSim(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Kernel.cosineSim($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): CosineSimExpr = copy(l, r)
  }

  /** `graft_tokens(s)` → whitespace tokens of `trim(lower(s))` (see the
    * kernel [[tokensOf]]); null-safe, codegen'd, one byte pass. */
  case class TokensExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullSafeEval(s: Any): Any =
      tokensOf(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernel.tokensOf($c)")
    override protected def withNewChildInternal(c: Expression): TokensExpr =
      copy(c)
  }

  /** `graft_nonalnum_count(s)` → code points outside `[a-zA-Z0-9 ]`
    * (see the kernel [[nonAlnumCount]]); null-safe, codegen'd. */
  case class NonAlnumCountExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(s: Any): Any =
      nonAlnumCount(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernel.nonAlnumCount($c)")
    override protected def withNewChildInternal(
        c: Expression): NonAlnumCountExpr = copy(c)
  }

  /** `graft_shingle_hash60(tk)` → hash60 of each distinct word
    * `n`-gram shingle in first-occurrence order (see the kernel
    * [[shingleHashes]]); null-safe, codegen'd, one pass. */
  case class ShingleHash60Expr(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def nullSafeEval(tk: Any): Any =
      shingleHashes(tk.asInstanceOf[ArrayData], n)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernel.shingleHashes($c, $n)")
    override protected def withNewChildInternal(
        c: Expression): ShingleHash60Expr = copy(child = c)
  }

  /** Positional sibling of [[ShingleHash60Expr]] (see the kernel
    * [[positionalShingleHashes]]); null-safe, codegen'd, one pass. */
  case class PositionalShingleHash60Expr(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def nullSafeEval(tk: Any): Any =
      positionalShingleHashes(tk.asInstanceOf[ArrayData], n)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernel.positionalShingleHashes($c, $n)")
    override protected def withNewChildInternal(
        c: Expression): PositionalShingleHash60Expr = copy(child = c)
  }

  /** `graft_trigrams(s)` → distinct char trigrams of `lower(s)` in
    * first-occurrence order (see the kernel [[trigramsOf]]); null-safe,
    * codegen'd, one O(len) pass. */
  case class TrigramsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullSafeEval(s: Any): Any =
      trigramsOf(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernel.trigramsOf($c)")
    override protected def withNewChildInternal(c: Expression): TrigramsExpr =
      copy(c)
  }

  /** `graft_bigram_runs(tk)` → struct(best, nruns, singles) of the
    * sorted adjacent-bigram runs (see the kernel [[bigramRuns]]);
    * null-safe, codegen'd, one pass. */
  case class BigramRunsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("best", LongType, nullable = false),
      StructField("nruns", LongType, nullable = false),
      StructField("singles", LongType, nullable = false)))
    override def nullSafeEval(tk: Any): Any =
      bigramRuns(tk.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernel.bigramRuns($c)")
    override protected def withNewChildInternal(c: Expression): BigramRunsExpr =
      copy(c)
  }

  /** `graft_hash60(s)` → the 60-bit md5-derived hash (see the kernel
    * [[hash60]]); null-safe, codegen'd, byte-path only. */
  case class Hash60Expr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(s: Any): Any =
      hash60(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernel.hash60($c)")
    override protected def withNewChildInternal(c: Expression): Hash60Expr =
      copy(c)
  }

  /** Plain sequential-fold dot product — for plans that precompute
    * per-vector norms once instead of re-deriving them per pair. */
  case class DotExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      dotProduct(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Kernel.dotProduct($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DotExpr = copy(l, r)
  }

  /** `graft_nearest_centroids(vec, centroidMatrix, n)` — ids (row
    * indices into the matrix) of the `n` centroids with highest cosine
    * similarity to `vec`, best first; ties broken by lower id. The
    * matrix arrives as a literal array<array<double>> (broadcast by
    * value — IVF centroid sets are tiny next to the corpus), so corpus
    * assignment is a NARROW pass: no join, no shuffle. */
  case class NearestCentroidsExpr(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(v0: Any, m0: Any, n0: Any): Any =
      nearestCentroids(v0.asInstanceOf[ArrayData], m0.asInstanceOf[ArrayData],
        n0.asInstanceOf[Int])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (v, m, n) => s"$Kernel.nearestCentroids($v, $m, $n)")
    override protected def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression): NearestCentroidsExpr =
      copy(a, b, c)
  }

  /** `graft_nearest_centroids_l2(vec, centroidMatrix, n)` — like
    * [[NearestCentroidsExpr]] but by Euclidean distance (PQ codebook
    * assignment). */
  case class NearestCentroidsL2Expr(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(v0: Any, m0: Any, n0: Any): Any =
      nearestCentroidsL2(v0.asInstanceOf[ArrayData], m0.asInstanceOf[ArrayData],
        n0.asInstanceOf[Int])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (v, m, n) => s"$Kernel.nearestCentroidsL2($v, $m, $n)")
    override protected def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression): NearestCentroidsL2Expr =
      copy(a, b, c)
  }

  /** Cosine similarity DIRECTLY on int8 code arrays (array<tinyint>) —
    * the fused quantized kernel. Under symmetric per-vector scaling
    * (graft.llmops.Quantize) the scales cancel out of cosine:
    * (s_a·a)·(s_b·b) / (|s_a·a||s_b·b|) = a·b / (|a||b|) — so the
    * similarity of the CODES equals the similarity of the dequantized
    * vectors, with the dot products computed in exact integer
    * arithmetic (long accumulators: 127²·dim ≪ 2⁶³). No dequantize
    * pass, no double multiplies in the hot loop — this is why int8
    * storage also WINS compute, not just footprint. */
  case class CosineSimQ8Expr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      cosineSimQ8(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Kernel.cosineSimQ8($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): CosineSimQ8Expr = copy(l, r)
  }

  /** `graft_dot_q8(a, b)` → long integer dot of int8 code arrays (see
    * [[dotQ8]]). */
  case class DotQ8Expr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(l: Any, r: Any): Any =
      dotQ8(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Kernel.dotQ8($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DotQ8Expr = copy(l, r)
  }

  /** One-pass symmetric int8 quantization: array<double> →
    * struct(scale double, q array<tinyint>) (see [[quantize]]). The
    * HOF formulation re-derived the scale (itself an O(dim) array_max)
    * INSIDE the per-element lambda once Catalyst inlined it — O(dim²)
    * per row, and the reason the quantized search initially cost more
    * than float32. */
  case class QuantizeExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("scale", DoubleType, nullable = false),
      StructField("q", ArrayType(ByteType, containsNull = false),
        nullable = false)))
    override def nullSafeEval(input: Any): Any =
      quantize(input.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernel.quantize($c)")
    override protected def withNewChildInternal(c: Expression): QuantizeExpr =
      copy(c)
  }

  /** `graft_ahash_bands(binary)` → array<int> of 4 × 16-bit perceptual
    * average-hash bands (see [[aHashBands]]). */
  case class AHashBandsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      aHashBands(input.asInstanceOf[Array[Byte]])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernel.aHashBands($c)")
    override protected def withNewChildInternal(c: Expression): AHashBandsExpr =
      copy(c)
  }

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_lsh_buckets",
      es => LshBucketsExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine",
      es => CosineSimExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine_q8",
      es => CosineSimQ8Expr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_dot_q8",
      es => DotQ8Expr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_quantize",
      es => QuantizeExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_dot",
      es => DotExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_hash60",
      es => Hash60Expr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_trigrams",
      es => TrigramsExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bigram_runs",
      es => BigramRunsExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_tokens",
      es => TokensExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_nonalnum_count",
      es => NonAlnumCountExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_nearest_centroids",
      es => NearestCentroidsExpr(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_nearest_centroids_l2",
      es => NearestCentroidsL2Expr(es(0), es(1), es(2)), "scala_udf")
    // Spark's own runtime-filter Bloom pair, surfaced as callable
    // functions for the incremental-dedup screen (llmops.BloomDedup).
    // Both are codegen'd catalyst expressions; the aggregate is
    // tree-merged (partial blooms OR-combined map-side).
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      es => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bloom_contains",
      es => new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bloom_probe",
      es => BloomProbeExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_sorted_icount",
      es => SortedIntersectCountExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_sortable_double",
      es => SortableDoubleExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_log2_fp",
      es => Log2FpExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_ahash_bands",
      es => AHashBandsExpr(es.head), "scala_udf")
  }

  /** Order-preserving DOUBLE → BIGINT: the standard IEEE-754 total-order
    * transform (`bits ^ ((bits >> 63) & Long.MaxValue)`), so
    * `a < b ⟺ sortable(a) < sortable(b)` for all non-NaN doubles and,
    * crucially, EQUAL doubles map to equal longs. This is what makes an
    * exact distributed top-fraction selection possible without a global
    * sort: bucket rows by the high bits of this value, pick the
    * boundary bucket from a histogram-sized cumulative sum, and rank
    * only the boundary bucket — every comparison the original
    * `rank() OVER (ORDER BY score)` would have made is preserved.
    * (Caveat inherited from the transform: -0.0 sorts below +0.0,
    * whereas SQL compares them equal — callers bucketing scores that
    * can produce negative zero should normalize with `+ 0.0` first.) */
  def sortableDoubleBits(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & Long.MaxValue)
  }

  /** Fixed-point binary log of a rational: floor-ish log2(a/b) in
    * 2^-20 units, computed ENTIRELY in 64-bit integer arithmetic — no
    * libm, so the value is bit-identical in any engine that replays the
    * same integer recurrence (the DuckDB oracle unrolls it as a 20-step
    * CTE chain; see o3_bm25_rank). Algorithm: exponent from bit
    * lengths, 21-bit mantissa by one integer division, then 20
    * square-and-renormalize steps extracting one fraction bit each —
    * the classic shift-and-square binary logarithm. Inputs must satisfy
    * a ≥ b ≥ 1 (log ≥ 0) and a ≤ 2^42 (the mantissa shift must not
    * overflow); BM25 callers pass a = 2N+2, b = 2df+1. Deterministic
    * truncation error < 2^-19 — a SCORING definition (documented
    * deviation: BM25 with log2 idf, a uniform positive rescale that
    * preserves ranking), not an approximation to be compared against
    * libm. */
  def log2Fp(a: Long, b: Long): Long = {
    val e0 = (63 - java.lang.Long.numberOfLeadingZeros(a)) -
      (63 - java.lang.Long.numberOfLeadingZeros(b))
    val e =
      if (a >= (b << (e0 + 1))) e0 + 1
      else if (a < (b << e0)) e0 - 1
      else e0
    var m = (a << 21) / (b << e) // in [2^21, 2^22)
    var f = 0L
    var i = 0
    while (i < 20) {
      m = (m * m) >> 21
      if (m >= (1L << 22)) { m = m >> 1; f = 2 * f + 1 } else f = 2 * f
      i += 1
    }
    (e.toLong << 20) + f
  }

  case class Log2FpExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable || right.nullable
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (left.dataType == LongType && right.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_log2_fp expects (BIGINT, BIGINT), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    override protected def nullSafeEval(a: Any, b: Any): Any =
      log2Fp(a.asInstanceOf[Long], b.asInstanceOf[Long])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.GraftFunctions.log2Fp($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Log2FpExpr = copy(l, r)
  }

  case class SortableDoubleExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == DoubleType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_sortable_double expects DOUBLE, got ${child.dataType.simpleString}")
    override protected def nullSafeEval(input: Any): Any =
      sortableDoubleBits(input.asInstanceOf[Double])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.GraftFunctions.sortableDoubleBits($c)")
    override protected def withNewChildInternal(c: Expression): SortableDoubleExpr =
      copy(c)
  }

  /** Two-pointer intersection COUNT over two SORTED distinct int
    * arrays — what every dedup verify stage actually needs from
    * `size(array_intersect(a, b))`, without materializing the
    * intersection array (ArrayIntersect builds a hash set and an output
    * array per pair; the verify joins evaluate this once per CANDIDATE
    * PAIR, the hottest spot of the containment/jaccard paths). Inputs
    * are the `gs` gram sets from docGramStats: sorted, distinct,
    * non-null ints — the kernel is one allocation-free walk. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getInt(i); val y = b.getInt(j)
      if (x == y) { c += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  case class SortedIntersectCountExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable || right.nullable
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_sorted_icount expects two ARRAY<INT> inputs, got $other")
      }
    override protected def nullSafeEval(a: Any, b: Any): Any =
      sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.GraftFunctions.sortedIntersectCount($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): SortedIntersectCountExpr = copy(l, r)
  }

  /** Per-executor cache of deserialized Bloom filters, keyed by a
    * content fingerprint of the blob — so a COLUMN-valued filter (the
    * sharded-bloom join brings each row its shard's blob, and UnsafeRow
    * hands back a fresh byte[] copy per access) deserializes once per
    * executor, not once per row. A fingerprint collision could swap
    * filters (a false NEGATIVE the confirm join cannot fix), so the key
    * is (xxhash64 of the full blob, murmur3_32 of the full blob,
    * length): two independent full-content hashes ≈ 96 bits — NOT the
    * old (murmur32, first8, last8) key, whose head/tail words were the
    * serialization header (constant across shards) and a possibly-zero
    * sparse bit-array tail, leaving ~32 effective bits. The cache is
    * size-bounded so successive corpora over an executor's lifetime
    * don't accumulate dead blobs: past [[MaxEntries]] it is cleared
    * wholesale (entries are shard-count-few and cheap to re-admit). */
  object BloomProbeKernel {
    private final val MaxEntries = 128
    private val cache = new java.util.concurrent.ConcurrentHashMap[
      (Long, Int, Int), org.apache.spark.util.sketch.BloomFilter]()
    def mightContain(blob: Array[Byte], h: Long): Boolean = {
      val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
      val key = (
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(blob, off, blob.length, 42L),
        org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes(blob, off, blob.length, 42),
        blob.length)
      var bf = cache.get(key)
      if (bf == null) {
        bf = org.apache.spark.util.sketch.BloomFilter.readFrom(blob)
        if (cache.size >= MaxEntries) cache.clear()
        cache.putIfAbsent(key, bf)
      }
      bf.mightContainLong(h)
    }
  }

  /** Static forwarder for [[BloomProbeExpr]]'s generated code: Janino
    * cannot resolve a nested Scala object (`BloomProbeKernel$`) through
    * the outer class, but top-level object methods get true static
    * forwarders. */
  def bloomMightContain(blob: Array[Byte], h: Long): Boolean =
    BloomProbeKernel.mightContain(blob, h)

  /** `graft_bloom_probe(blob, hash)` — like Spark's `might_contain` but
    * accepting a NON-foldable (column-valued) filter, which the
    * built-in rejects by design (it exists for runtime filters). Used
    * by the sharded-bloom dedup screen, where each batch row probes its
    * own shard's blob. Codegen'd; the kernel caches deserialization
    * per executor (see [[BloomProbeKernel]]). */
  case class BloomProbeExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_probe expects (BINARY, BIGINT), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    override protected def nullSafeEval(blob: Any, h: Any): Any =
      BloomProbeKernel.mightContain(blob.asInstanceOf[Array[Byte]],
        h.asInstanceOf[Long])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (b, h) =>
        s"graft.functions.GraftFunctions.bloomMightContain($b, $h)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): BloomProbeExpr = copy(l, r)
  }
}
