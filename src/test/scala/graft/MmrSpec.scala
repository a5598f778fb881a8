package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions._
import graft.knn.{Knn, Mmr}

/** MMR-diversified top-k: structural invariants of the greedy selection
  * plus the behavior the operator exists for — a near-duplicate of the
  * best hit is pushed DOWN the list relative to plain kNN.
  */
class MmrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  private val D = core.Tables.EmbeddingDim

  test("rerank returns k distinct candidates ranked 1..k, scores non-increasing") {
    val out = Mmr.rerank(core.Tables.embeddings(spark, sf), "embedding",
        hashVectorLit(7, D), k = 10)
      .orderBy("rnk").collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(0)).toSeq == (1L to 10L))
    assert(out.map(_.getLong(1)).distinct.length == 10)
    // greedy MMR objective is non-increasing FROM RANK 2 ON: each added
    // selection can only raise every remaining candidate's max-sim
    // penalty. Rank 1 is excluded — its score is pure λ·rel with a zero
    // penalty by convention, and when every candidate sits at NEGATIVE
    // similarity to the top hit (penalty < 0 is a bonus), rank 2 can
    // legitimately score above it.
    val scores = out.map(_.getDouble(2)).toSeq.drop(1)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, scores)
  }

  test("first selection is the plain top-1 relevance hit") {
    val knn1 = Knn.search(core.Tables.embeddings(spark, sf),
        col("embedding"), hashVectorLit(7, D), "cosine", 1)
      .head.getLong(0)
    val mmr1 = Mmr.rerank(core.Tables.embeddings(spark, sf), "embedding",
        hashVectorLit(7, D)).orderBy("rnk").head.getLong(1)
    assert(mmr1 == knn1)
  }

  test("a near-duplicate of the top hit is demoted below rank 2") {
    import spark.implicits._
    // hand-built 4-dim corpus with wide margins (≫ the 1e-6 rounding):
    //   v1 best hit (rel .950074), v2 a near-duplicate of v1 (sim(v2,v1)
    //   = .999950), v3/v4 diverse directions at rel .849903 mutually
    //   .722 similar — greedy MMR at λ=.5 must pick 1, 3, 4, 2
    val rows = Seq(
      (1L, Seq(0.95f, 0.312f, 0f, 0f)),
      (2L, Seq(0.9405f, 0.30888f, 0f, 0.01f)), // 0.99·v1 + 0.01·e4
      (3L, Seq(0.85f, 0f, 0.527f, 0f)),
      (4L, Seq(0.85f, 0f, 0f, 0.527f)))
    val data = rows.toDF("vec_id", "embedding")
    val q = typedlit(Seq(1.0, 0.0, 0.0, 0.0))
    val knn = Knn.search(data, col("embedding"), q, "cosine", 4)
      .collect().map(_.getLong(0)).toSeq
    assert(knn.take(2) == Seq(1L, 2L)) // plain kNN keeps the duplicate on top
    val mmr = Mmr.rerank(data, "embedding", q, n = 4, k = 4)
      .orderBy("rnk").collect().map(_.getLong(1)).toSeq
    assert(mmr == Seq(1L, 3L, 4L, 2L),
      s"MMR did not demote the near-duplicate: $mmr")
  }

  test("selection is a subset of the top-n relevance candidates") {
    val e = core.Tables.embeddings(spark, sf)
    val candIds = e
      .withColumn("rel",
        lit(1.0) - cosineDistance(col("embedding"), hashVectorLit(7, D)))
      .orderBy(col("rel").desc, col("vec_id")).limit(50)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val sel = Mmr.rerank(e, "embedding", hashVectorLit(7, D))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(sel.subsetOf(candIds))
  }
}
