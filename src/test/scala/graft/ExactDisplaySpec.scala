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

  test("disp2From4: exact .XX50 sums round half away from zero, both signs") {
    // the q3_join shape that fired at the first automated 10× decade
    // certification (r12): a 1e-4-unit sum ending in 50 displayed at 2
    // decimals — e.g. 15121901485350 units = 1512190148.5350 → ...8.54
    def run(u: Long): Double = spark
      .sql(s"SELECT CAST($u AS BIGINT) AS u")
      .select(org.apache.spark.sql.functions
        .expr(ExactDisplay.disp2From4Str("u")).as("v"))
      .collect()(0).getDouble(0)
    assert(run(15121901485350L) == 1512190148.54)
    assert(run(-15121901485350L) == -1512190148.54)
    assert(run(49L) == 0.0)
    assert(run(50L) == 0.01)
    assert(run(-50L) == -0.01)
    // BigDecimal HALF_UP reference over randomized 1e-4 sums
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 0 until 100) {
      val u = rnd.nextLong() % 1000000000000L
      val exp = new java.math.BigDecimal(u).movePointLeft(4)
        .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(run(u) == exp, s"disp2From4($u)")
    }
  }

  test("mean4 matches the BigDecimal HALF_UP reference at 1e-4 resolution") {
    def run(m: Long, n: Long): Double = spark
      .sql(s"SELECT CAST($m AS BIGINT) AS m, CAST($n AS BIGINT) AS n")
      .select(org.apache.spark.sql.functions
        .expr(ExactDisplay.mean4Str("m", "n")).as("v"))
      .collect()(0).getDouble(0)
    def ref4(m: Long, n: Long): Double = new java.math.BigDecimal(m)
      .divide(new java.math.BigDecimal(n), 0, java.math.RoundingMode.HALF_UP)
      .doubleValue() / 1e4
    assert(run(3L, 2L) == 2e-4) // exact tie away from zero
    assert(run(-3L, 2L) == -2e-4)
    val rnd = new scala.util.Random(20260816L)
    for (_ <- 0 until 100) {
      val m = rnd.nextLong() % 100000000L
      val n = math.abs(rnd.nextLong() % 9999L) + 1L
      assert(run(m, n) == ref4(m, n), s"mean4($m, $n)")
    }
  }

  test("the DuckDB twin is textually non-negative-division only") {
    // both engine strings route every integer division through the
    // CASE's non-negative branch operands; a bare `div`/`//` over a
    // possibly-negative numerator would diverge between engines
    val s = ExactDisplay.mean6Str("x", "n")
    val d = ExactDisplay.mean6Sql("x", "n")
    assert(s.contains("CASE WHEN (x) >= 0") && d.contains("CASE WHEN (x) >= 0"))
    assert(d == s.replace(" div ", " // "))
    assert(ExactDisplay.disp2From4Sql("x") ==
      ExactDisplay.disp2From4Str("x").replace(" div ", " // "))
    assert(ExactDisplay.mean4Sql("x", "n") ==
      ExactDisplay.mean4Str("x", "n").replace(" div ", " // "))
  }
}
