package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.filter._

/** Null/missing-field semantics of the filter DSL — the reference contract
  * (vectordb_optimized.py:79-105): a missing field fails every leaf,
  * including ne/nin; Not() then sees plain two-valued logic.
  */
class FilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("cat", StringType, nullable = true),
      StructField("x", DoubleType, nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1, "a", 1.0),
        Row(2, "b", 2.0),
        Row(3, null, null),
        Row(4, "a", null)),
      schema)
  }

  private def ids(p: Pred): Set[Int] =
    df.filter(p.column).collect().map(_.getInt(0)).toSet

  test("eq fails on NULL") { assert(ids(Eq("cat", "a")) == Set(1, 4)) }

  test("ne requires presence (NULL row excluded)") {
    assert(ids(Ne("cat", "a")) == Set(2))
  }

  test("nin requires presence") {
    assert(ids(Nin("cat", Seq("b"))) == Set(1, 4))
  }

  test("not(eq) is TRUE on NULL (reference two-valued negation)") {
    assert(ids(Not(Eq("cat", "a"))) == Set(2, 3))
  }

  test("ordered compares fail on NULL") {
    assert(ids(Gt("x", 1.5)) == Set(2))
    assert(ids(Lte("x", 1.5)) == Set(1))
  }

  test("contains/regex stringify and fail on NULL") {
    assert(ids(Contains("cat", "a")) == Set(1, 4))
    assert(ids(Regex("cat", "^[ab]$")) == Set(1, 2, 4))
  }

  test("boolean composition and dict shorthand") {
    assert(ids(Or(Eq("cat", "b"), Gt("x", 0.5))) == Set(1, 2))
    assert(ids(And(Eq("cat", "a"), Not(Gt("x", 1.5)))) == Set(1, 4))
    assert(ids(FilterDsl.fromMap(Map("cat" -> "a", "x" -> 1.0))) == Set(1))
    assert(ids(FilterDsl.fromMap(Map.empty)) == Set(1, 2, 3, 4))
  }

  test("filters push down to the parquet scan") {
    val plan = core.Tables.lineitem(spark, SparkTestSession.sf)
      .filter(And(Eq("l_returnflag", "R"), Gt("l_quantity", 30)).column)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan)
  }
}
