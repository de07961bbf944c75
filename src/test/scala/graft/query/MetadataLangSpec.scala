package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MetadataLangSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a1", Map("color" -> "red", "size" -> "10")),
    ("a2", Map("color" -> "blue", "material" -> "steel")),
    ("a3", Map("colour" -> "red")))
    .toDF("id", "MD")

  test("parses AND/OR chains left-associatively") {
    val e = MetadataLang.parse("color:red OR color:blue AND size:10")
    // ((color:red OR color:blue) AND size:10)
    assert(e == MetadataLang.And(
      MetadataLang.Or(MetadataLang.Pair("color", "red"),
        MetadataLang.Pair("color", "blue")),
      MetadataLang.Pair("size", "10")))
  }

  test("pair is exact unless the value has wildcards") {
    val exact = MetadataLang.compileOverMap(
      MetadataLang.parse("color:red"), col("MD"))
    assert(df.filter(exact).select("id").as[String].collect().toSeq == Seq("a1"))
    val wild = MetadataLang.compileOverMap(
      MetadataLang.parse("color:*l*"), col("MD"))
    assert(df.filter(wild).select("id").as[String].collect().toSeq == Seq("a2"))
  }

  test("key mode matches key wildcards (F7 metadataKey search)") {
    val keyHit = MetadataLang.compileOverMap(
      MetadataLang.parse("colo*r:x"), col("MD"), mode = "key")
    assert(df.filter(keyHit).select("id").as[String].collect().sorted.toSeq ==
      Seq("a1", "a2", "a3"))
  }

  test("value mode searches all values (F7 metadataValue search)") {
    val valHit = MetadataLang.compileOverMap(
      MetadataLang.parse("k:*eel*"), col("MD"), mode = "value")
    assert(df.filter(valHit).select("id").as[String].collect().toSeq == Seq("a2"))
  }
}
