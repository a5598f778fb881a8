package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.functions.VectorFunctions._
import graft.knn.Knn
import graft.quant.{BinaryQuant, ProductQuant, ScalarQuant}

/** Recall gates for the approximate search paths vs exact kNN — the
  * reference's own test discipline (quantization.py:691-778 uses exact
  * brute force as the recall oracle).
  */
class QuantSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val D = Tables.EmbeddingDim
  private val qv = hashVectorValues(7L, D)

  // localCheckpoint, not cache(): see AnnSpec — a cache() of the bare
  // embeddings scan hijacks every other suite's plans via CacheManager
  private lazy val emb =
    Tables.embeddings(spark, SparkTestSession.sf).localCheckpoint()

  private def exactTopIds(k: Int): Set[Long] =
    Knn.search(emb, col("embedding"), typedlit(qv), "l2", k, idCol = "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet

  test("SQ approx-L2 top-10 has high recall vs exact") {
    val got = ScalarQuant.searchL2(emb, "embedding", "vec_id", qv, D, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = got.intersect(exactTopIds(10)).size / 10.0
    assert(recall >= 0.8, s"SQ recall@10 = $recall")
  }

  test("BQ hamming top-10 overlaps exact top-100 (coarse 1-bit recall)") {
    val got = BinaryQuant.searchHamming(emb, "embedding", "vec_id", qv, D, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val overlap = got.intersect(exactTopIds(100)).size / 10.0
    assert(overlap >= 0.2, s"BQ top-10 ∩ exact top-100 = $overlap")
  }

  test("PQ ADC top-10 overlaps exact top-50") {
    val cb = ProductQuant.train(emb, "embedding", D, m = 8, k = 16)
    val got = ProductQuant.searchAdc(emb, "embedding", "vec_id", cb, qv, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val overlap = got.intersect(exactTopIds(50)).size / 10.0
    assert(overlap >= 0.3, s"PQ top-10 ∩ exact top-50 = $overlap")
  }

  test("adaptiveK: clamp(n/8, 16, 256) — capacity grows with the corpus") {
    import graft.quant.ProductQuant.adaptiveK
    assert(adaptiveK(0) == 16)
    assert(adaptiveK(128) == 16)   // below ~2k vecs: floor, never overfit
    assert(adaptiveK(500) == 62)   // sf0.001/sf0.01 embeddings
    assert(adaptiveK(2000) == 250) // sf0.1
    assert(adaptiveK(15000) == 256) // the 30x draw that caught fixed-k
    assert(adaptiveK(Long.MaxValue / 2) == 256) // no overflow at corpus scale
  }

  test("SQ encode bounds: all codes in [0, 255]") {
    val enc = emb
      .crossJoin(broadcast(ScalarQuant.statsRow(emb, "embedding")))
      .selectExpr(s"${ScalarQuant.encodeExpr("embedding", D)} as code")
      .selectExpr("array_min(code) as lo", "array_max(code) as hi")
      .agg(min("lo"), max("hi")).head()
    assert(enc.getInt(0) >= 0 && enc.getInt(1) <= 255)
  }
}
