package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C5 — the 13 metadata value types validate per their declared tag
  * (metadata.py:44-221), including the lla range checks.
  */
class TypedValueSpec extends SparkSpec {
  import spark.implicits._

  private def check(rows: (String, String)*): Map[Int, Boolean] = {
    val df = rows.toSeq.zipWithIndex
      .map { case ((t, v), i) => (i, t, v) }.toDF("i", "t", "v")
    df.select(col("i"), Codecs.typedValueValid(col("v"), col("t")).as("ok"))
      .as[(Int, Boolean)].collect().toMap
  }

  test("valid examples of every type pass") {
    val got = check(
      "string" -> "hello",
      "multiline_string" -> "a\nb",
      "inline_controlled_list" -> "red",
      "number" -> "-12.5",
      "boolean" -> "Yes",
      "date" -> "2024-02-29T10:30:00",
      "json" -> """{"a":1}""",
      "xyz" -> """{"x":1.0,"y":2.0,"z":3.0}""",
      "wxyz" -> """{"w":1.0,"x":0.0,"y":0.0,"z":0.0}""",
      "matrix4x4" -> """[[1,0,0,0],[0,1,0,0],[0,0,1,0],[0,0,0,1]]""",
      "geopoint" -> """{"type":"Point","coordinates":[13.4,52.5]}""",
      "geojson" -> """{"type":"Polygon","coordinates":[[0,0]]}""",
      "lla" -> """{"lat":52.5,"long":13.4,"alt":34.0}""")
    assert(got.values.forall(identity), got.toString)
  }

  test("invalid values fail: bad numbers, out-of-range lla, ragged matrix") {
    val got = check(
      "number" -> "abc",
      "boolean" -> "maybe",
      "date" -> "not-a-date",
      "xyz" -> """{"x":1.0,"y":2.0}""",
      "matrix4x4" -> """[[1,0,0],[0,1,0],[0,0,1]]""",
      "geopoint" -> """{"type":"LineString","coordinates":[1,2]}""",
      "lla" -> """{"lat":95.0,"long":13.4,"alt":0.0}""",
      "lla" -> """{"lat":10.0,"long":181.0,"alt":0.0}""")
    assert(got.values.forall(v => !v), got.toString)
  }
}
