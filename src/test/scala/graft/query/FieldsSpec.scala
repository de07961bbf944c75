package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FieldsSpec extends SparkSpec {
  import spark.implicits._
  import Fields._

  test("F8: prefix and type-prefix field resolution (back-compat forms)") {
    assert(resolve("MD_str_product") == MetadataField("product"))
    assert(resolve("MD_.product") == MetadataField("product"))
    assert(resolve("MD_num_polycount") == MetadataField("polycount"))
    assert(resolve("AB_str_codec") == AttributeField("codec"))
    assert(resolve("str_assetname") == CoreField("str_assetname"))
    assert(resolve("plain") == CoreField("plain"))
  }

  test("F14: field classification core / containers / excluded") {
    val (core, containers, excluded) = classify(Seq(
      "str_assetname", "MD", "AB", "_docId", "VAMS_internal", "num_filesize"))
    assert(core == Seq("str_assetname", "num_filesize"))
    assert(containers == Seq("MD", "AB"))
    assert(excluded == Seq("_docId", "VAMS_internal"))
  }

  test("F16: explanation lists matched fields with the score") {
    val df = Seq(("Red Rocket", "a red toy")).toDF("name", "desc")
    val e = df.select(explanation(Seq("name" -> 3.0, "desc" -> 2.0), "red")
      .as("ex")).select("ex.matched_fields", "ex.score")
      .as[(Seq[String], Double)].head()
    assert(e._1 == Seq("name", "desc") && e._2 == 5.0)
  }
}
