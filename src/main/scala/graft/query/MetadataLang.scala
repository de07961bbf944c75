package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F6 — the metadata search mini-language.
  *
  * Reference: `backend/backend/handlers/search/search.py:1123-1303` parses
  * `"k:v AND k2:v2"` / `OR` chains; each pair is exact unless the value
  * carries `*`/`?` wildcards; modes `key`/`value`/`both` decide whether the
  * pair constrains the key, the value, or both.
  *
  * Grammar here (left-associative, AND binds no tighter than OR — the
  * reference folds pairwise in order): expr := pair ((AND|OR) pair)*
  */
object MetadataLang {

  sealed trait Expr
  final case class Pair(key: String, value: String) extends Expr
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr

  def parse(q: String): Expr = {
    val toks = q.trim.split("\\s+").toList
    def pair(t: String): Pair = t.split(":", 2) match {
      case Array(k, v) => Pair(k, v)
      case _           => Pair("_value", t) // bare term searches values
    }
    def loop(acc: Expr, rest: List[String]): Expr = rest match {
      case Nil => acc
      case op :: p :: tail if op.equalsIgnoreCase("AND") => loop(And(acc, pair(p)), tail)
      case op :: p :: tail if op.equalsIgnoreCase("OR")  => loop(Or(acc, pair(p)), tail)
      case p :: tail => loop(And(acc, pair(p)), tail) // implicit AND
    }
    toks match {
      case Nil          => throw new IllegalArgumentException("empty query")
      case head :: tail => loop(pair(head), tail)
    }
  }

  /** Compile against a resolver from metadata key → value column. */
  def compile(e: Expr, resolve: String => Column): Column = e match {
    case Pair(k, v) => QueryCompiler.wildcardOrExact(resolve(k), v)
    case And(l, r)  => compile(l, resolve) && compile(r, resolve)
    case Or(l, r)   => compile(l, resolve) || compile(r, resolve)
  }

  /** Compile against a `MapType(String,String)` metadata column (the A7
    * pivoted form), mode ∈ key|value|both (search.py:1201-1290). */
  def compileOverMap(e: Expr, md: Column, mode: String = "both"): Column = e match {
    case Pair(k, v) =>
      val keyHit = exists(map_keys(md), c => QueryCompiler.wildcard(c, k))
      val valHit = exists(map_values(md), c => QueryCompiler.wildcard(c, v))
      val pairHit = QueryCompiler.wildcardOrExact(element_at(md, k), v)
      mode match {
        case "key"   => keyHit
        case "value" => valHit
        case _       => pairHit
      }
    case And(l, r) => compileOverMap(l, md, mode) && compileOverMap(r, md, mode)
    case Or(l, r)  => compileOverMap(l, md, mode) || compileOverMap(r, md, mode)
  }
}
