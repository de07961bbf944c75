package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  test("MinHash signature equals a reference Scala computation") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e g")).toDF("doc_id", "text")
    val gh = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
      .select(col("doc_id"), explode(Text.shingles(col("tk"))).as("gram"))
      .withColumn("g", Text.hash60(col("gram")))
    val sigs = gh.groupBy("doc_id").agg(MinHash.minhash(col("g")).as("sig"))
      .as[(Long, Array[Long])].collect().toMap
    // independent reference computation from the collected hashes
    val hashes = gh.select("doc_id", "g").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((doc, gs) <- hashes) {
      val expect = Array.tabulate(MinHash.NumPerm) { j =>
        gs.map(g => (MinHash.A(j) * g + MinHash.B(j)) % MinHash.P).min
      }
      assert(sigs(doc).toSeq == expect.toSeq, s"doc $doc")
    }
  }

  test("MinHash est similarity tracks true Jaccard on planted near-dups") {
    // the sf0.001 documents table has 25 planted pairs with jaccard>=0.8
    val q = graft.registry.LlmQueries.defs
      .find(_.name == "llm_dedup_minhash").get
    val out = q.fn(spark, sf()).as[(Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    for ((_, _, nMatch, jac) <- out if jac >= 0.8) {
      val est = nMatch.toDouble / MinHash.NumPerm
      assert(math.abs(est - jac) < 0.35,
        s"estimate $est too far from true $jac")
    }
    // every high-jaccard ngram pair must be found by the LSH candidates
    val exact = graft.registry.LlmQueries.defs
      .find(_.name == "llm_dedup_ngram_jaccard").get
      .fn(spark, sf()).as[(Long, Long, Long, Double)].collect()
      .filter(_._4 >= 0.8).map(r => (r._1, r._2)).toSet
    val found = out.map(r => (r._1, r._2)).toSet
    assert(exact.subsetOf(found), s"missed pairs: ${exact diff found}")
  }

  test("SimHash: identical docs get identical fingerprints, near-dups close") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")).toDF("doc_id", "text")
    val fp = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
      .select(col("doc_id"), explode(Text.shingles(col("tk"))).as("gram"))
      .withColumn("g", Text.hash60(col("gram")))
      .groupBy("doc_id").agg(SimHash.simhash(col("g")).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) > 3)
  }

  test("LSH top-k achieves high recall vs brute force on real embeddings") {
    val e = Tables.embeddings(spark, sf())
    val queries = e.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(queries, e, k = 5)
      .select("q_id", "cand_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(queries, e, k = 5)
      .select("q_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    // measured 0.67 on this data, run-stable; floor leaves jitter room
    assert(recall >= 0.55, s"recall $recall too low") // single-table LSH
    // top-1 within-bucket hit should mostly agree with brute top-1
    assert(lsh.nonEmpty)
  }

  test("int8 quantization: 4x smaller codes, >0.995 cosine to the original") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val rt = e.withColumn("qv", Quantize.quantize(col("v")))
      .withColumn("back", Quantize.dequantize(col("qv")))
      .select(Similarity.cosine(col("v"), col("back")).as("sim"),
        size(col("qv.q")).as("n"))
      .as[(Double, Int)].collect()
    assert(rt.nonEmpty)
    rt.foreach { case (sim, _) => assert(sim > 0.995, s"cosine $sim") }
    // tinyint codes: 1 byte/dim vs 4 (float32) — 4x + one double scale
    assert(rt.forall(_._2 == 64))
  }

  test("quantized-store top-k keeps high recall vs float32 exact search") {
    val e = Tables.embeddings(spark, sf())
    val queries = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, e, k = 5)
      .select("q_id", "cand_id").as[(Long, Long)].collect().toSet
    val q8 = graft.SparkEntry.queries("llm_sim_topk_q8")(spark, sf())
      .select("q_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect q8).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall $recall below 0.8")
  }

  test("IVF top-k: k rows per query, useful recall") {
    val e = Tables.embeddings(spark, sf())
    val queries = e.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(queries, e, k = 5)
      .select("q_id", "cand_id").as[(Long, Long)].collect().toSet
    // NOTE: no run-to-run exact-equality assertion here — the k-means
    // centroid mean folds floats in shuffle-fetch order, so a near-tie
    // assignment may legitimately flip between executions; recall and
    // shape invariants are the stable contract.
    val ivf1 = Similarity.ivfTopK(queries, e, k = 5)
      .select("q_id", "rank", "cand_id").as[(Long, Int, Long)].collect()
    val pairs = ivf1.map(r => (r._1, r._3)).toSet
    val recall = (brute intersect pairs).size.toDouble / brute.size
    // measured 0.80 on this data under farthest-point seeding +
    // nprobe 8 (was 0.57 with stride seeding + nprobe 4); floor leaves
    // jitter room while catching any index regression
    assert(recall >= 0.7, s"recall $recall too low") // nprobe 8 of 16 lists
    // every query returns k rows (probed lists are never empty at k=5)
    val perQuery = ivf1.groupBy(_._1).view.mapValues(_.length)
    assert(perQuery.values.forall(_ == 5))
  }

  test("brute top-k under degenerate vectors: null embeddings excluded, NaN sims rank first") {
    // the bounded-aggregate ranker's documented contract: a null
    // embedding cannot rank (its sim is unknown — excluded, where the
    // old window would have ranked it after the real scores), and a
    // zero-norm vector's NaN sim ranks FIRST, matching Spark's and
    // DuckDB's NaN-greatest DESC sort (negate() flips NaN's sign bit,
    // so the sortable image alone would bury it last)
    val vecs = Seq(
      (1L, Array.tabulate(8)(i => 0.1f * i)),
      (2L, Array.tabulate(8)(i => 0.1f * i + 0.01f)),
      (3L, Array.fill(8)(0.0f)),          // zero norm → NaN sim
      (4L, null.asInstanceOf[Array[Float]]) // null embedding
    ).toDF("vec_id", "embedding")
    val got = Similarity
      .bruteForceTopK(vecs.filter(col("vec_id") === 1L), vecs, k = 3)
      .select("rank", "cand_id").as[(Int, Long)].collect().toSeq
      .sortBy(_._1)
    assert(got.map(_._2) == Seq(3L, 2L),
      s"expected NaN candidate first then the near-dup, no null row: $got")
  }

  test("custom Catalyst expressions match the HOF reference bit-exactly") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      .withColumn("w", reverse(col("v")))
    val cos = e.select(
      Similarity.cosine(col("v"), col("w")).as("fast"),
      Similarity.cosineHof(col("v"), col("w")).as("ref"))
      .as[(Double, Double)].collect()
    assert(cos.nonEmpty && cos.forall { case (f, r) => f == r })
    val buckets = e.select(
      Similarity.lshBucketArray(col("v")).as("fast"),
      Similarity.lshBucketArrayHof(col("v")).as("ref"))
      .as[(Array[Long], Array[Long])].collect()
    assert(buckets.nonEmpty &&
      buckets.forall { case (f, r) => f.toSeq == r.toSeq })
  }

  test("batched inference labeling emits mergeable metadata rows (W6)") {
    val payloads = Seq(
      Inference.AssetPayload("db1", "a1", "/m.gltf", Array[Byte](1, 2, 3)),
      Inference.AssetPayload("db1", "a2", "/n.gltf", Array[Byte](1, 2, 3, 4)))
      .toDS()
    val rows = Inference.labelAssets(payloads).collect()
    assert(rows.length == 4) // 2 keys per asset
    val a1 = rows.filter(_.assetId == "a1").map(r =>
      r.metadataKey -> (r.metadataValue, r.metadataValueType)).toMap
    assert(a1("ai_label") == (("vehicle", "string"))) // 3 bytes % 3 == 0
    assert(a1("ai_confidence")._2 == "number")
    // deterministic across runs
    assert(Inference.labelAssets(payloads).collect().toSeq == rows.toSeq)
  }

  test("label consolidation: casing merges, acronyms survive, none drops, 10% cut") {
    val vl = (
      Seq.fill(5)(("db1", "a1", "Red Car")) ++  // merges with the lowercase run
      Seq.fill(4)(("db1", "a1", "red car")) ++
      Seq.fill(2)(("db1", "a1", "CAD")) ++      // acronym keeps its case
      Seq.fill(3)(("db1", "a1", "none")) ++     // per-view 'none' results drop
      Seq(("db1", "a1", "outlier")) ++          // 1 of 12 kept < 10% → cut
      Seq(("db2", "b1", "tree"))                // second asset, freq 100%
    ).toDF("databaseId", "assetId", "label")
    val out = Inference.consolidateLabels(vl)
      .as[(String, String, String, String, String)].collect().sortBy(_._2)
    assert(out.length == 2)
    val (_, _, k1, v1, t1) = out(0)
    assert(k1 == "aiKeywords" && t1 == "string")
    // 12 occurrences total after the 'none' drop: red car 9, CAD 2,
    // outlier 1 → outlier (8.3%) cut, CAD (16.7%) kept
    assert(v1 == """["CAD","red car"]""", v1)
    assert(out(1)._4 == """["tree"]""")
  }

  test("multimodal batch extraction is deterministic and batch-shaped") {
    val media = Seq(
      (1L, "img", "hello".getBytes("UTF-8")),
      (2L, "aud", Array.emptyByteArray))
      .toDF("doc_id", "kind", "media")
    val got = Multimodal.extractFeaturesDF(media)
      .as[(Long, String, Long, String, Int)].collect().sortBy(_._1)
    assert(got(0) == ((1L, "img", 5L, "5d41402abc4b2a76b9719d911017c592", 6)))
    assert(got(1)._3 == 0L && got(1)._5 == 1)
  }

  test("aHash matches an independent computation and bands catch planted near-dups") {
    // independent re-derivation of the 4x16 band packing for one payload
    val payload = ("the quick brown fox jumps over the lazy dog " * 4).getBytes("UTF-8")
    val got = Multimodal.aHashStub(Multimodal.MediaRecord(7L, "img", payload))
    val len = payload.length
    val sb = Array.tabulate(64)(i => payload((len.toLong * i / 64).toInt) & 0xff)
    val mean = sb.sum / 64
    val bits = sb.map(b => if (b > mean) 1 else 0)
    def expectBand(j: Int) =
      (0 until 16).map(b => bits(16 * j + b) << b).sum
    assert((got.b0, got.b1, got.b2, got.b3) ==
      ((expectBand(0), expectBand(1), expectBand(2), expectBand(3))))
    // DF path equals the per-row stub (batching must not change results)
    val df = Seq((1L, "img", payload), (2L, "img", payload.reverse))
      .toDF("doc_id", "kind", "media")
    val viaDf = Multimodal.aHashDF(df)
      .as[(Long, String, Int, Int, Int, Int)].collect().sortBy(_._1)
    val direct = Seq((1L, payload), (2L, payload.reverse)).map { case (id, p) =>
      val h = Multimodal.aHashStub(Multimodal.MediaRecord(id, "img", p))
      (id, "img", h.b0, h.b1, h.b2, h.b3)
    }
    assert(viaDf.toSeq == direct)
    // a sum-preserving perturbation (swap two sampled bytes) keeps the
    // integer mean fixed, so at most the two swapped positions flip =>
    // hamming <= 2 and pigeonhole (4 bands) leaves >= 1 band identical,
    // so the band join finds the pair
    val si = Array.tabulate(64)(i => (len.toLong * i / 64).toInt)
    val (pi, pj) = (for { i <- si; j <- si if payload(i) != payload(j) }
      yield (i, j)).head
    val near = payload.clone()
    near(pi) = payload(pj); near(pj) = payload(pi)
    val a = Multimodal.aHashStub(Multimodal.MediaRecord(1L, "img", payload))
    val b = Multimodal.aHashStub(Multimodal.MediaRecord(2L, "img", near))
    val hamming = Integer.bitCount(a.b0 ^ b.b0) + Integer.bitCount(a.b1 ^ b.b1) +
      Integer.bitCount(a.b2 ^ b.b2) + Integer.bitCount(a.b3 ^ b.b3)
    assert(hamming <= 2, s"hamming $hamming")
    assert(Seq(a.b0 == b.b0, a.b1 == b.b1, a.b2 == b.b2, a.b3 == b.b3)
      .count(identity) >= 1)
    // fuzz: kernel ≡ stub on random payloads of random lengths
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val p = Array.fill(64 + rnd.nextInt(4000))(rnd.nextInt(256).toByte)
      val viaStub = Multimodal.aHashStub(Multimodal.MediaRecord(0L, "x", p))
      val viaKernel = graft.functions.GraftFunctions.aHashBands(p)
      assert(Seq(viaStub.b0, viaStub.b1, viaStub.b2, viaStub.b3) ==
        (0 until 4).map(viaKernel.getInt), s"len ${p.length}")
    }
    // the codegen twin equals the batched-decode path on the real fixture
    val docs = Tables.documents(spark, sf())
      .filter(length(col("text")) >= 64).select(col("doc_id"), col("text"))
    val viaExpr = Multimodal.aHashBands(docs)
      .select("doc_id", "b0", "b1", "b2", "b3")
      .as[(Long, Int, Int, Int, Int)].collect().sortBy(_._1)
    val viaBatch = Multimodal.aHashDF(docs.select(col("doc_id"),
        lit("img").as("kind"), col("text").cast("binary").as("media")))
      .select("doc_id", "b0", "b1", "b2", "b3")
      .as[(Long, Int, Int, Int, Int)].collect().sortBy(_._1)
    assert(viaExpr.length == viaBatch.length && viaExpr.nonEmpty)
    assert(viaExpr.toSeq == viaBatch.toSeq)
  }

  test("language-id marker scoring is deterministic with precedence ties") {
    val q = graft.registry.LlmQueries.defs.find(_.name == "llm_text_langid").get
    val out = q.fn(spark, sf())
      .select("predicted").as[String].collect()
    assert(out.nonEmpty && out.forall(Set("en", "de", "es", "fr")))
  }
}
