package graft.filter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Metadata filter DSL — graft's WHERE clause, mirroring the reference's
  * predicate engine (jcolano/fastpyvectordb `vectordb_optimized.py:59-184`):
  * ten comparison ops plus boolean composition and the `{k: v}` dict
  * shorthand.
  *
  * Semantics contract (reference `FilterCondition.evaluate:79-105`): a
  * missing/NULL field makes every *leaf* predicate false — including `ne`
  * and `nin`, which only hold when the field is present with a different
  * value. Composition is then ordinary two-valued boolean logic (so
  * `Not(Eq(f, v))` is TRUE on a row where `f` is NULL, exactly like the
  * reference's `not evaluate(...)`).
  *
  * Everything compiles to a single Catalyst `Column`, so filters push
  * down into the Parquet scan (`PushedFilters` in explain) and prune
  * row groups at 100 TB scale — the reference instead post-filters
  * materialized candidates per row in Python.
  */
sealed trait Pred {
  /** Predicate column. Leaves are raw three-valued SQL predicates so they
    * push down into the Parquet scan (a `coalesce(p, false)` wrapper would
    * make PushedFilters empty — verified in FilterSpec). Three-valued NULL
    * propagation through AND/OR selects exactly the same rows as the
    * reference's two-valued logic once `.filter()` drops top-level NULLs;
    * negation is the one diverging spot, handled inside [[Not]].
    */
  def column: Column
}

final case class Eq(field: String, v: Any) extends Pred {
  def column: Column = col(field) === lit(v)
}

/** True only when the field is present AND differs (reference `:87-88`). */
final case class Ne(field: String, v: Any) extends Pred {
  def column: Column = col(field).isNotNull && col(field) =!= lit(v)
}

final case class Gt(field: String, v: Any) extends Pred {
  def column: Column = col(field) > lit(v)
}
final case class Gte(field: String, v: Any) extends Pred {
  def column: Column = col(field) >= lit(v)
}
final case class Lt(field: String, v: Any) extends Pred {
  def column: Column = col(field) < lit(v)
}
final case class Lte(field: String, v: Any) extends Pred {
  def column: Column = col(field) <= lit(v)
}

final case class In(field: String, vs: Seq[Any]) extends Pred {
  def column: Column = col(field).isin(vs: _*)
}

/** Present AND not in list (reference `:99-100`). */
final case class Nin(field: String, vs: Seq[Any]) extends Pred {
  def column: Column = col(field).isNotNull && !col(field).isin(vs: _*)
}

/** Substring match on the stringified value (reference `:101-102`). */
final case class Contains(field: String, s: String) extends Pred {
  def column: Column = col(field).cast("string").contains(s)
}

/** Unanchored regex search (reference `re.search`, `:103-104`; Spark
  * `rlike` has identical search — not full-match — semantics). */
final case class Regex(field: String, pattern: String) extends Pred {
  def column: Column = col(field).cast("string").rlike(pattern)
}

final case class And(ps: Seq[Pred]) extends Pred {
  def column: Column = ps.map(_.column).reduceOption(_ && _).getOrElse(lit(true))
}
object And { def apply(ps: Pred*)(implicit d: DummyImplicit): And = And(ps.toSeq) }

final case class Or(ps: Seq[Pred]) extends Pred {
  def column: Column = ps.map(_.column).reduceOption(_ || _).getOrElse(lit(false))
}
object Or { def apply(ps: Pred*)(implicit d: DummyImplicit): Or = Or(ps.toSeq) }

final case class Not(p: Pred) extends Pred {
  // NOT NULL is NULL in SQL but TRUE in the reference (a failed leaf is
  // plain false, `vectordb_optimized.py:175-177`) — force two-valued here.
  def column: Column = !coalesce(p.column, lit(false))
}

object FilterDsl {
  /** `{k: v, …}` shorthand → AND of equalities; empty ⇒ always-true
    * (reference `Filter.from_dict`, `vectordb_optimized.py:179-184`). */
  def fromMap(m: Map[String, Any]): Pred =
    And(m.toSeq.map { case (k, v) => Eq(k, v): Pred })
}
