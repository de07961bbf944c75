package graft.api

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.query.{SearchRequest, Token}

/** Route-equality fuzz for the F3/F7 trigram route chooser
  * (SearchApi.search's `scanDocs` choice): random SearchRequests across
  * tokens × operations × wildcards × negations × partial index
  * coverage × staleness must return EXACTLY the scan route's rows —
  * the chooser changes the plan, never the rows. The hand-picked
  * SearchApiSpec cases pin the pruning happens; this pins that no
  * generated predicate shape can make the pruned superset drop a row
  * (the conjunct-only / negation-safe / every-OR-column-indexed
  * conditions are predicate logic, the bug class the model-fuzz
  * families exist for).
  */
class SearchApiFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val Vocab = Array("rocket", "car", "vehicle", "scan", "toy",
    "engine", "wing", "red", "blue", "old", "model", "probe")
  private val Types = Array("gltf", "obj", "fbx", "stl")

  private lazy val docsDir = {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 48).map { i =>
      val name = s"${Vocab(rnd.nextInt(Vocab.length))} ${Vocab(rnd.nextInt(Vocab.length))}"
      val desc = s"${Vocab(rnd.nextInt(Vocab.length))} ${Vocab(rnd.nextInt(Vocab.length))} ${Vocab(rnd.nextInt(Vocab.length))}"
      (s"db${i % 3}#a$i", s"db${i % 3}", s"a$i", name, desc,
        Types(rnd.nextInt(Types.length)), i % 7 == 0)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft-f3fuzz").toString + "/docs"
    rows.toDF("_docId", "str_databaseid", "str_assetid", "str_assetname",
        "str_description", "str_assettype", "bool_archived")
      .repartitionByRange(4, col("str_assetname"))
      .write.parquet(dir)
    dir
  }

  test("1000 random requests: pruned-route rows are identical to scan-route rows") {
    val docs = spark.read.parquet(docsDir)
    assert(docs.inputFiles.length == 4)
    val indexable = Seq("str_assetname", "str_description", "str_assettype",
      "str_assetid", "str_databaseid")
    val rnd = new scala.util.Random(42)

    def word(): String = {
      val w = Vocab(rnd.nextInt(Vocab.length))
      rnd.nextInt(4) match {
        case 0 => w                                  // full word
        case 1 => w.take(2 + rnd.nextInt(3))         // prefix fragment
        case 2 => w.drop(1).take(3)                  // inner fragment
        case _ => if (rnd.nextBoolean()) Types(rnd.nextInt(Types.length))
                  else w.take(1 + rnd.nextInt(2))    // sub-trigram (no pruning)
      }
    }

    def randomRequest(): SearchRequest = {
      // a token naming a column the table lacks is a request ERROR on
      // both routes (UNRESOLVED_COLUMN), not a route-equality case —
      // fields stay within the schema
      val fields = "all" +: indexable
      val tokens = Seq.fill(rnd.nextInt(4)) {
        Token(fields(rnd.nextInt(fields.length)),
          if (rnd.nextInt(4) == 0) "!:" else ":", word())
      }
      SearchRequest(
        tokens = tokens,
        operation = if (rnd.nextBoolean()) "AND" else "OR",
        query = if (rnd.nextInt(3) == 0) Some(word()) else None,
        includeArchived = rnd.nextBoolean())
    }

    var pruned = 0
    var divergences = List.empty[String]
    for (trial <- 0 until 1000) {
      val req = randomRequest()
      // partial index coverage: sometimes the binding only claims a
      // subset of columns; staleness: sometimes the binding is stale
      val coverage =
        if (rnd.nextInt(3) == 0) rnd.shuffle(indexable).take(2).toSet
        else indexable.toSet
      val stale = rnd.nextInt(10) == 0
      val binding = Some(SearchApi.TextIndexBinding(docsDir, coverage,
        indexedVersion = if (stale) 3 else 5, tableVersion = 5))

      val scan = SearchApi.search(docs, req).hits
      val routed = SearchApi.search(docs, req, textIndex = binding).hits
      val want = scan.select("_docId").as[String].collect().sorted.toSeq
      val got = routed.select("_docId").as[String].collect().sorted.toSeq
      if (got != want)
        divergences ::= s"trial $trial req=$req coverage=$coverage " +
          s"stale=$stale want=$want got=$got"
      if (routed.inputFiles.count(_.contains("/docs/")) < 4) pruned += 1
      assert(divergences.isEmpty, divergences.headOption.getOrElse(""))
    }
    // the fuzz must actually exercise the pruned route, not just the
    // fallback (sub-trigram fragments and stale bindings don't prune)
    assert(pruned > 100, s"only $pruned/1000 requests pruned the scan")
  }
}
