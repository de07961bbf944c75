package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** F6 mini-language under randomized differential testing: random
  * query strings (exact and wildcard pairs, bare terms, AND/OR chains
  * with implicit-AND gaps and mixed operator case) compiled over a
  * `map<string,string>` metadata column must agree row-for-row with an
  * independent Scala interpreter of the documented semantics
  * (search.py:1123-1303): pair = exact value match on the key unless
  * the value carries `*`/`?` (then case-insensitive LIKE), a missing
  * key matches nothing, key/value modes scan key and value sets with
  * substring-or-wildcard semantics, fold strictly left-associative.
  */
class MetadataLangPropertySpec extends SparkSpec {
  import spark.implicits._

  private val Keys = Vector("color", "size", "owner", "shape")
  private val Vals = Vector("red", "green", "blue", "small", "Big", "x1")

  private def likeMatch(value: String, pattern: String): Boolean = {
    val rx = java.util.regex.Pattern.quote _
    val regex = pattern.toLowerCase.flatMap {
      case '*' => ".*"
      case '?' => "."
      case ch => rx(ch.toString)
    }
    value.toLowerCase.matches(regex)
  }

  private def pairHit(md: Map[String, String], k: String, v: String): Boolean =
    md.get(k) match {
      case None => false
      case Some(x) =>
        if (v.contains('*') || v.contains('?')) likeMatch(x, v)
        else x == v
    }

  private def keyHit(md: Map[String, String], k: String): Boolean =
    md.keys.exists(c =>
      if (k.contains('*') || k.contains('?')) likeMatch(c, k)
      else c.toLowerCase.contains(k.toLowerCase))

  private def valHit(md: Map[String, String], v: String): Boolean =
    md.values.exists(c =>
      if (v.contains('*') || v.contains('?')) likeMatch(c, v)
      else c.toLowerCase.contains(v.toLowerCase))

  private def evalExpr(md: Map[String, String], e: MetadataLang.Expr,
      mode: String): Boolean = e match {
    case MetadataLang.Pair(k, v) => mode match {
      case "key"   => keyHit(md, k)
      case "value" => valHit(md, v)
      case _       => pairHit(md, k, v)
    }
    case MetadataLang.And(l, r) =>
      evalExpr(md, l, mode) && evalExpr(md, r, mode)
    case MetadataLang.Or(l, r) =>
      evalExpr(md, l, mode) || evalExpr(md, r, mode)
  }

  test("random queries agree with the interpreter in all three modes") {
    val rnd = new scala.util.Random(42601)
    def pick[A](xs: Vector[A]): A = xs(rnd.nextInt(xs.size))
    val rows: Seq[(Long, Map[String, String])] = (0L until 250L).map { i =>
      i -> Keys.filter(_ => rnd.nextBoolean())
        .map(k => k -> pick(Vals)).toMap
    }
    val df = rows.toDF("id", "md").repartition(4).cache()

    def genValue(): String = {
      val base = pick(Vals)
      rnd.nextInt(4) match {
        case 0 => "*" + base.drop(1)
        case 1 => base.dropRight(1) + "?"
        case _ => base
      }
    }
    def genQuery(): String = {
      val n = 1 + rnd.nextInt(4)
      val sb = new StringBuilder
      (0 until n).foreach { i =>
        if (i > 0) rnd.nextInt(3) match {
          case 0 => sb.append(" AND ")
          case 1 => sb.append(if (rnd.nextBoolean()) " OR " else " or ")
          case _ => sb.append(" ") // implicit AND
        }
        if (rnd.nextInt(6) == 0) sb.append(genValue()) // bare term
        else sb.append(pick(Keys)).append(":").append(genValue())
      }
      sb.toString
    }

    (1 to 150).foreach { trial =>
      val q = genQuery()
      val e = MetadataLang.parse(q)
      for (mode <- Seq("both", "key", "value")) {
        val got = df.filter(MetadataLang.compileOverMap(e, col("md"), mode))
          .select("id").as[Long].collect().toSet
        // bare terms parse to key "_value", which no map carries: in
        // "both" mode the interpreter's missing-key rule applies
        val want = rows.collect {
          case (id, md) if evalExpr(md, e, mode) => id
        }.toSet
        assert(got == want,
          s"trial $trial mode=$mode query='$q' parsed=$e\n" +
            s"only-compiled=${(got -- want).toSeq.sorted.take(5)} " +
            s"only-interp=${(want -- got).toSeq.sorted.take(5)}")
      }
    }
    df.unpersist()
  }
}
