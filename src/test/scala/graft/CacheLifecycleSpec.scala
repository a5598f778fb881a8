package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.bm25.Bm25
import graft.core.Tables
import graft.dedup.Dedup
import graft.functions.VectorFunctions._
import graft.hybrid.HybridSearch

/** Operators must not leak CacheManager entries: intermediates are
  * localCheckpoint'ed (GC-scoped storage), so a long-lived session running
  * many ad-hoc queries needs no clearCache between requests.
  */
class CacheLifecycleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def cachedPlans: Int =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager match {
      case cm => if (cm.isEmpty) 0 else 1
    }

  test("ad-hoc search operators leave the CacheManager empty") {
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf)
    val corpus = docs
      .join(Tables.embeddings(spark, sf), col("doc_id") === col("vec_id"))
      .select("doc_id", "text", "embedding")
    Bm25.search(spark, docs, Seq("spark", "join"), 5).collect()
    HybridSearch.search(spark, corpus, Seq("spark"),
      hashVectorValues(5L, Tables.EmbeddingDim), 5, 0.6).collect()
    Dedup.minhashLshPairs(docs, 5).collect()
    Dedup.nearDupComponents(docs).count()
    assert(cachedPlans == 0,
      "operator leaked a persisted plan into the CacheManager")
  }
}
