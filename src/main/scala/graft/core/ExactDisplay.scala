package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Exact-integer display rounding for micro-unit aggregates.
  *
  * The engine's determinism discipline accumulates fractional measures
  * as `round(x · 1e6)` BIGINT micro-units so sums are partition-order
  * exact (see [[graft.text.NgramLm]]). The one place cross-engine
  * luck could still creep in was the DISPLAY step: `round(micro / 1e6
  * / n, 6)` divides by a data-dependent denominator in IEEE doubles
  * first, and when the true quotient lands exactly on a 5 in the 7th
  * decimal the Spark and DuckDB `round` builtins may break the tie on
  * different sides of the double's binary representation — observed
  * once, as a 1-ulp `nll` split on 1 of 50k docs at the 10× decade
  * corpus (SURVEY §6.7). These helpers do the HALF_UP at micro-unit
  * resolution in EXACT integer arithmetic instead, so the displayed
  * 6-decimal value is a pure function of the integer sum and count in
  * both engines: `mean6 = sign · ((2·|m| + n) intdiv (2·n)) / 1e6`.
  *
  * Both operands are routed through non-negative integer division
  * because the engines' integer-divide builtins disagree on negatives
  * (Spark `div` truncates toward zero, DuckDB `//` floors); on
  * non-negative operands they coincide, and the explicit sign split
  * reproduces round-half-away-from-zero — the behavior both engines'
  * double `round` applies on untied values.
  */
object ExactDisplay {

  /** Spark column: HALF_UP(micro6 / n) displayed as a 6-decimal double.
    * `micro6` / `n` are SQL expression strings (n must be a positive
    * integer expression; micro6 any integer expression). */
  def mean6(micro6: String, n: String): Column = expr(mean6Str(micro6, n))

  def mean6Str(micro6: String, n: String): String =
    s"(CASE WHEN ($micro6) >= 0" +
      s" THEN (2 * ($micro6) + ($n)) div (2 * ($n))" +
      s" ELSE -((2 * -($micro6) + ($n)) div (2 * ($n))) END) / 1e6"

  /** DuckDB twin of [[mean6Str]] (`//` in place of `div`; on the
    * non-negative operands both are plain integer division). Callers
    * passing a DuckDB `sum(...)` should CAST it to BIGINT first, per
    * the oracle type-tag rule. */
  def mean6Sql(micro6: String, n: String): String =
    s"(CASE WHEN ($micro6) >= 0" +
      s" THEN (2 * ($micro6) + ($n)) // (2 * ($n))" +
      s" ELSE -((2 * -($micro6) + ($n)) // (2 * ($n))) END) / 1e6"

  /** HALF_UP display at 2 decimals of a 1e-4-unit integer sum — the
    * money-product shape: `cents(price) · (100 − pct(discount))` is an
    * EXACT 1e-4-unit integer, its BIGINT sum is partition-order exact,
    * and the 2-decimal display becomes a pure integer function in both
    * engines. The double-sum form this replaces ties at the 2-decimal
    * boundary whenever the exact 4-decimal sum ends in 50 — ~1% of
    * group rows — and the first 10×-sf0.01 decade certification caught
    * exactly that (q3_join revenue .53 vs .54, r12). */
  def disp2From4Str(u4: String): String =
    s"(CASE WHEN ($u4) >= 0 THEN (($u4) + 50) div 100" +
      s" ELSE -((-($u4) + 50) div 100) END) / 1e2"

  /** DuckDB twin of [[disp2From4Str]]. */
  def disp2From4Sql(u4: String): String =
    s"(CASE WHEN ($u4) >= 0 THEN (($u4) + 50) // 100" +
      s" ELSE -((-($u4) + 50) // 100) END) / 1e2"

  /** HALF_UP(micro4 / n) displayed as a 4-decimal double — [[mean6Str]]
    * at 1e-4 resolution (integral measures averaged to 4 decimals). */
  def mean4Str(micro4: String, n: String): String =
    s"(CASE WHEN ($micro4) >= 0" +
      s" THEN (2 * ($micro4) + ($n)) div (2 * ($n))" +
      s" ELSE -((2 * -($micro4) + ($n)) div (2 * ($n))) END) / 1e4"

  /** DuckDB twin of [[mean4Str]]. */
  def mean4Sql(micro4: String, n: String): String =
    s"(CASE WHEN ($micro4) >= 0" +
      s" THEN (2 * ($micro4) + ($n)) // (2 * ($n))" +
      s" ELSE -((2 * -($micro4) + ($n)) // (2 * ($n))) END) / 1e4"
}
