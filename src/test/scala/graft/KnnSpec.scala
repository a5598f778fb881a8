package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions._

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class KnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("distance kernels match hand-computed values") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      vecDot($"a", $"b"), cosineDistance($"a", $"b"), l2Distance($"a", $"b"),
      ipDistance($"a", $"b")).head()
    assert(r.getDouble(0) === 32.0)
    val cos = 1.0 - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(r.getDouble(1) - cos) < 1e-12)
    assert(math.abs(r.getDouble(2) - math.sqrt(27.0)) < 1e-12)
    assert(r.getDouble(3) === -32.0)
  }

  test("distance kernels reject mismatched dimensions") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(cosineDistance($"a", $"b")).collect()
    }
    assert(ex.getMessage.contains("dimension mismatch") ||
      Option(ex.getCause).exists(_.getMessage.contains("dimension mismatch")))
  }

  test("hashVector is deterministic and in range") {
    val v = spark.range(1).select(hashVector(lit(7), 16)).head()
      .getSeq[Double](0)
    assert(v.length == 16)
    assert(v.forall(x => x >= -0.5 && x < 0.5))
    val v2 = spark.range(1).select(hashVector(lit(7), 16)).head()
      .getSeq[Double](0)
    assert(v == v2)
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, SparkTestSession.sf).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("knn search stays inside whole-stage codegen") {
    val plan = Catalog.byName("knn_cosine").run(spark, SparkTestSession.sf)
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into WholeStageCodegen stage n.
    assert(plan.contains("*(1) Project"), plan)
  }

  test("oracle SQL exists for every catalog query that claims one") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
