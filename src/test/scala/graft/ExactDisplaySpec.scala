package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.ExactDisplay

/** The exact-integer display mean (micro-unit sums → 6-decimal value)
  * must implement round-half-away-from-zero as a pure function of the
  * integer operands — the double-division path it replaced hit a
  * cross-engine round-tie once (1 ulp on 1/50k docs at the 10× decade
  * corpus, SURVEY §6.7). Pins: exact ties round away from zero in both
  * signs, agreement with an exact BigDecimal reference on randomized
  * operands, NULL denominators stay NULL, and the Spark `div` path
  * never sees a negative operand (Spark `div` truncates while DuckDB
  * `//` floors — they only coincide on non-negatives).
  */
class ExactDisplaySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(m: Long, n: Long): java.lang.Double = {
    val df = spark.sql(s"SELECT CAST($m AS BIGINT) AS m, " +
      s"CAST($n AS BIGINT) AS n")
    val v = df.select(ExactDisplay.mean6("m", "n").as("v"))
      .collect()(0)
    if (v.isNullAt(0)) null else v.getDouble(0)
  }

  private def ref(m: Long, n: Long): Double =
    new java.math.BigDecimal(m)
      .divide(new java.math.BigDecimal(n), 0, java.math.RoundingMode.HALF_UP)
      .doubleValue() / 1e6

  test("exact .5 micro-unit ties round away from zero, both signs") {
    // 3400348.5 micro-units — the observed 10× tie doc's shape
    assert(run(3400348500L, 1000L) == 3.400349)
    assert(run(-3400348500L, 1000L) == -3.400349)
    // half-unit over a denominator of 2
    assert(run(3L, 2L) == 2e-6)
    assert(run(-3L, 2L) == -2e-6)
  }

  test("matches the exact BigDecimal HALF_UP reference on random operands") {
    val rnd = new scala.util.Random(20260815L)
    // one Spark job over all cases (a per-case collect would dominate)
    val cases = Seq.fill(200)(
      (rnd.nextLong() % 100000000L, math.abs(rnd.nextLong() % 9999L) + 1L))
    val sql = cases.zipWithIndex.map { case ((m, n), i) =>
      s"SELECT $i AS i, CAST($m AS BIGINT) AS m, CAST($n AS BIGINT) AS n"
    }.mkString(" UNION ALL ")
    val got = spark.sql(sql)
      .select(org.apache.spark.sql.functions.col("i"),
        ExactDisplay.mean6("m", "n").as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    cases.zipWithIndex.foreach { case ((m, n), i) =>
      assert(got(i) == ref(m, n), s"mean6($m, $n)")
    }
  }

  test("NULL denominator (nullif guard) stays NULL") {
    val v = spark.sql("SELECT CAST(5 AS BIGINT) AS m, " +
      "nullif(CAST(0 AS BIGINT), 0) AS n")
      .select(ExactDisplay.mean6("m", "n").as("v")).collect()(0)
    assert(v.isNullAt(0))
  }

  test("the DuckDB twin is textually non-negative-division only") {
    // both engine strings route every integer division through the
    // CASE's non-negative branch operands; a bare `div`/`//` over a
    // possibly-negative numerator would diverge between engines
    val s = ExactDisplay.mean6Str("x", "n")
    val d = ExactDisplay.mean6Sql("x", "n")
    assert(s.contains("CASE WHEN (x) >= 0") && d.contains("CASE WHEN (x) >= 0"))
    assert(d == s.replace(" div ", " // "))
  }
}
