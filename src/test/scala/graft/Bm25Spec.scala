package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.bm25.Bm25
import graft.hybrid.HybridSearch
import graft.functions.VectorFunctions

class Bm25Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1, "spark query engine with catalyst optimizer"),
    (2, "spark spark spark repeated mentions of spark"),
    (3, "completely unrelated text about gardening tools"),
    (4, "query optimizer notes")).toDF("doc_id", "text")

  test("bm25 ranks term-frequency-saturated docs sensibly") {
    val top = Bm25.search(spark, docs, Seq("spark"), 3).collect()
    val ids = top.map(_.getInt(0)).toSeq
    assert(ids.head == 2, "tf-heavy doc wins")
    assert(ids.contains(1))
    assert(!ids.contains(3), "no-match doc must not appear")
  }

  test("multi-term query sums per-term contributions") {
    val top = Bm25.search(spark, docs, Seq("query", "optimizer"), 4).collect()
    val ids = top.map(_.getInt(0)).toSeq
    assert(ids.take(2).toSet == Set(1, 4))
  }

  test("hybrid blend: keyword-only docs get vector_score 0") {
    val corpus = docs.withColumn("embedding",
      VectorFunctions.hashVector(org.apache.spark.sql.functions.col("doc_id"), 8))
    val res = HybridSearch.search(spark, corpus, Seq("gardening"),
      VectorFunctions.hashVectorValues(1L, 8), 4, alpha = 0.5).collect()
    assert(res.nonEmpty)
    // doc 3 is the only keyword hit -> keyword_score 1.0 after max-norm
    val d3 = res.find(_.getInt(0) == 3).get
    assert(d3.getDouble(2) == 1.0)
  }
}
