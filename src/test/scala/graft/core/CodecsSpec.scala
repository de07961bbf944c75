package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Codecs.multipartETag]] to the true S3 multipart composite-ETag
  * algorithm — MD5 over the CONCATENATED BINARY part digests, suffixed
  * `-{numParts}` — against vectors computed independently with a
  * reference MD5 implementation. The oracle-gated `s11_multipart_complete`
  * row can only replay a hex-digest surrogate (DuckDB's md5 is
  * VARCHAR-only), so the binary form is pinned here instead.
  */
class CodecsSpec extends SparkSpec {

  private def etagOf(parts: Seq[String]): String = {
    import spark.implicits._
    Seq(parts).toDF("p")
      .select(Codecs.multipartETag(
        transform(col("p"), x => md5(x))).as("etag"))
      .as[String].head()
  }

  test("multipartETag matches independently computed S3 composite vectors") {
    // md5(md5('abc') ++ md5('def')) and friends, digests concatenated as
    // raw bytes before the outer hash (NOT as hex text)
    assert(etagOf(Seq("abc", "def")) == "4c8e93283780e078db9e0c6b9b3f8043-2")
    assert(etagOf(Seq("hello world")) == "241d8a27c836427bd7f04461b60e7359-1")
    assert(etagOf(Seq("xxxxx", "yyy", "z")) ==
      "39a77bb7e86635294e266ef90cd231e1-3")
  }

  test("binary-concat composite differs from the hex-text surrogate") {
    import spark.implicits._
    // the surrogate used by the oracle row hashes the hex STRING
    // concatenation — same discrimination power, different bytes; this
    // guards against the two ever being silently conflated
    val surrogate = Seq(Seq("abc", "def")).toDF("p")
      .select(concat(
        md5(array_join(transform(col("p"), x => md5(x)), "")),
        lit("-2")).as("e"))
      .as[String].head()
    assert(surrogate != etagOf(Seq("abc", "def")))
    assert(surrogate.endsWith("-2") && surrogate.length == 34)
  }
}
