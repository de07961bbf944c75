package graft.authz

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SURVEY §7.5 risk #2: the regex/criteria → predicate translation
  * "must translate exactly … property tests against a straightforward
  * interpreter". This is that spec: a seeded randomized sweep drives
  * the compiled Column over randomized rows (nullable scalars + an
  * array field) against an independent Scala interpreter of the
  * reference semantics (authz/__init__.py:387-423; effect resolution
  * constants.py:127 — deny dominates, empty allow denies, a NULL field
  * matches NO criterion, including the negated ones: a deny rule on a
  * missing attribute denies nothing).
  */
class AbacPropertySpec extends SparkSpec {
  import Abac.{Criterion, Policy}
  import spark.implicits._

  private val Vals = Vector("red", "green", "blue", "redish", "x")
  private val Tags = Vector("t1", "t2", "t3", "t4")
  private val ScalarOps = Vector("equals", "contains", "does_not_contain",
    "starts_with", "ends_with", "is_one_of", "is_not_one_of")

  private case class R(id: Long, f1: Option[String], f2: String,
      tags: Seq[String])

  /** Reference interpreter — written directly from the reference
    * semantics, independent of the Column compiler. */
  private def evalRow(r: R, c: Criterion): Boolean = {
    def scalar(v: Option[String]): Boolean = v match {
      case None => false
      case Some(x) => c.operator match {
        case "equals"           => x == c.value
        case "contains"         => x.contains(c.value)
        case "does_not_contain" => !x.contains(c.value)
        case "starts_with"      => x.startsWith(c.value)
        case "ends_with"        => x.endsWith(c.value)
        case "is_one_of"        => c.values.contains(x)
        case "is_not_one_of"    => !c.values.contains(x)
      }
    }
    c.field match {
      case "f1" => scalar(r.f1)
      case "f2" => scalar(Some(r.f2))
      case "tags" => c.operator match {
        case "is_one_of" => r.tags.exists(c.values.contains)
        case "is_not_one_of" => !r.tags.exists(c.values.contains)
      }
    }
  }

  private def evalPolicy(r: R, p: Policy): Boolean = {
    def m(rules: Seq[Seq[Criterion]]) =
      rules.exists(rule => rule.nonEmpty && rule.forall(evalRow(r, _)))
    m(p.allow) && !m(p.deny)
  }

  test("compiled policies agree with the reference interpreter on 200 random policies") {
    val rnd = new scala.util.Random(20260814)
    def pick[A](xs: Vector[A]): A = xs(rnd.nextInt(xs.size))
    val rows = (0L until 300L).map { i =>
      R(i,
        if (rnd.nextInt(5) == 0) None else Some(pick(Vals)),
        pick(Vals),
        Seq.fill(rnd.nextInt(4))(pick(Tags)).distinct)
    }
    val df = rows.map(r => (r.id, r.f1.orNull, r.f2, r.tags))
      .toDF("id", "f1", "f2", "tags").repartition(5).cache()

    def genCriterion(): Criterion = {
      if (rnd.nextInt(4) == 0)
        Criterion("tags",
          if (rnd.nextBoolean()) "is_one_of" else "is_not_one_of",
          values = Seq.fill(1 + rnd.nextInt(3))(pick(Tags)).distinct)
      else {
        val op = pick(ScalarOps)
        Criterion(if (rnd.nextBoolean()) "f1" else "f2", op,
          value = pick(Vals),
          values = Seq.fill(1 + rnd.nextInt(3))(pick(Vals)).distinct)
      }
    }
    def genRules(max: Int): Seq[Seq[Criterion]] =
      Seq.fill(rnd.nextInt(max + 1))(
        Seq.fill(1 + rnd.nextInt(3))(genCriterion()))

    (1 to 200).foreach { trial =>
      val p = Policy(allow = genRules(3), deny = genRules(2))
      val got = Abac.enforce(df, p).select("id").as[Long].collect().toSet
      val want = rows.filter(evalPolicy(_, p)).map(_.id).toSet
      assert(got == want,
        s"trial $trial diverged: policy $p\n" +
          s"only-compiled=${(got -- want).toSeq.sorted.take(5)} " +
          s"only-interpreter=${(want -- got).toSeq.sorted.take(5)}")
    }
    df.unpersist()
  }
}
