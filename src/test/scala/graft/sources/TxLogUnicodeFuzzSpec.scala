package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property fuzz for TxLog's key-ordered machinery under HOSTILE key
  * alphabets — the bug class the round-12 UTF-8/UTF-16 ordering fix
  * closed, generalized: every file-skipping decision (merge's victim
  * probe, read's `keyRange`, read's `keyPrefixes`) must be invisible
  * next to a naive full-scan reference for keys drawn from the
  * characters where UTF-16 code-unit order and UTF-8 byte order
  * DISAGREE (BMP ≥ U+E000 vs supplementary-plane code points), mixed
  * with ASCII, combining marks, and '#'-adjacent separators. The
  * store's parquet footers, Spark's UTF8String sort, and cmpUtf8 all
  * order raw UTF-8 bytes; String.compareTo does not — any seam that
  * sorts with the wrong one silently drops files (missed rows) or
  * skips victims (stale duplicates). 60 seeded rounds. */
class TxLogUnicodeFuzzSpec extends SparkSpec {
  import spark.implicits._

  // code points chosen to straddle every ordering seam: ASCII around
  // '#', high-BMP (sorts AFTER supplementary in UTF-16, BEFORE in
  // UTF-8), and supplementary-plane chars (surrogate pairs)
  private val Alphabet: Vector[String] = Vector(
    "a", "z", "~", "0", "$",
    "é",      // é (2-byte UTF-8)
    "中",      // CJK (3-byte)
    "",      // private use, the UTF-16/UTF-8 divergence floor
    "",      // private use, high
    "ﬁ",      // ﬁ ligature
    new String(Character.toChars(0x1F600)), // 😀 (4-byte, surrogate)
    new String(Character.toChars(0x10348)), // 𐍈 (4-byte, low supplementary)
    new String(Character.toChars(0x2070E))) // CJK ext B

  private def rng(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  /** Independent UTF-8 byte comparison (unsigned lexicographic over
    * getBytes) — deliberately NOT TxLog's cmpUtf8, so the spec checks
    * the engine against a second implementation of the contract. */
  private def cmpU8(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  private def keyOf(r: Iterator[Long]): String = {
    val len = 1 + math.floorMod(r.next(), 4L).toInt
    (0 until len).map(_ =>
      Alphabet(math.floorMod(r.next(), Alphabet.length.toLong).toInt))
      .mkString
  }

  test("merge LWW, keyRange and keyPrefixes reads are exact under UTF-16/UTF-8-diverging keys") {
    (1 to 60).foreach { round =>
      val r = rng(round * 7919L)
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-u8fz-$round").toString
      // model: the expected key -> payload map under LWW merges
      var model = Map.empty[String, String]
      (1 to 3).foreach { gen =>
        val batch = (1 to 8).map { _ =>
          val k = "p0#" + keyOf(r)
          k -> s"g$gen-${math.floorMod(r.next(), 1000L)}"
        }.toMap // within-batch last-wins like the model
        TxLog.merge(spark, dir,
          batch.toSeq.map { case (k, v) => (k, "p0", v) }
            .toDF("_docId", "str_databaseid", "payload"))
        model = model ++ batch
      }
      val rows = TxLog.read(spark, dir)
        .select("_docId", "payload").as[(String, String)].collect().toSeq
      // duplicate keys are the victim-probe bug's exact symptom (a
      // stale row surviving next to its LWW replacement) — and a Map
      // collapse would HIDE them, so check row count first
      assert(rows.length == rows.map(_._1).distinct.length,
        s"round $round: duplicate keys in the store: " +
          rows.groupBy(_._1).filter(_._2.length > 1).keys.take(5))
      val got = rows.toMap
      assert(got == model,
        s"round $round: LWW state diverged (stale/lost rows)\n" +
          s"missing=${(model.keySet -- got.keySet).take(5)} " +
          s"extra=${(got.keySet -- model.keySet).take(5)} " +
          s"wrong=${model.collect { case (k, v) if got.get(k).exists(_ != v) => k }.take(5)}")
      val keys = model.keySet.toVector
      // keyRange probes: random [lo, hi] drawn from stored keys (both
      // orientations — a UTF-16-minded range would misjudge overlap).
      // File skipping is SUPERSET-safe (whole overlapping files read;
      // callers re-apply their predicate), so only MISSING rows fail.
      (1 to 6).foreach { _ =>
        val a = keys(math.floorMod(r.next(), keys.length.toLong).toInt)
        val b = keys(math.floorMod(r.next(), keys.length.toLong).toInt)
        // the range contract is UTF-8 byte order; order the endpoints
        // the way a caller holding byte-ordered bounds would
        val (lo, hi) = if (cmpU8(a, b) <= 0) (a, b) else (b, a)
        val gotR = TxLog.read(spark, dir, keyRange = Some((lo, hi)))
          .select("_docId").as[String].collect().toSet
        val expR = model.keySet.filter(k =>
          cmpU8(k, lo) >= 0 && cmpU8(k, hi) <= 0)
        assert(expR.subsetOf(gotR), s"round $round keyRange [$lo,$hi] " +
          s"dropped rows: ${(expR -- gotR).take(5)}")
      }
      // keyPrefixes probes: prefixes of stored keys + misses; the read
      // is superset-safe, so ONLY missing rows are a failure. Prefix
      // cuts snap to char boundaries — a split surrogate pair is not a
      // valid Unicode string and outside the probe contract.
      (1 to 6).foreach { _ =>
        val ps = (1 to 3).map { _ =>
          val k = keys(math.floorMod(r.next(), keys.length.toLong).toInt)
          var cut = 1 + math.floorMod(r.next(), k.length.toLong).toInt
          if (Character.isHighSurrogate(k.charAt(cut - 1))) cut += 1
          k.substring(0, cut)
        } :+ ("zz#" + keyOf(r))
        val gotP = TxLog.read(spark, dir, keyPrefixes = Some(ps))
          .select("_docId").as[String].collect().toSet
        val expP = model.keySet.filter(k => ps.exists(k.startsWith))
        assert(expP.subsetOf(gotP),
          s"round $round keyPrefixes $ps dropped rows: ${(expP -- gotP).take(5)}")
      }
    }
  }
}
