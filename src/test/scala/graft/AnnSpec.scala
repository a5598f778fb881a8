package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.functions.VectorFunctions._
import graft.knn.{Ann, Knn}

class AnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val D = Tables.EmbeddingDim
  private val qv = hashVectorValues(11L, D)
  private lazy val emb = Tables.embeddings(spark, SparkTestSession.sf).cache()

  private def exactTop(k: Int): Set[Long] =
    Knn.search(emb, col("embedding"), typedlit(qv), "cosine", k, idCol = "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet

  test("LSH candidates prune the corpus but keep near neighbors") {
    val got = Ann.lshSearch(emb, "embedding", "vec_id", qv, D, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.size == 10)
    val recall = got.intersect(exactTop(10)).size / 10.0
    info(s"LSH recall@10 vs exact = $recall")
    assert(recall >= 0.2, s"LSH recall collapsed: $recall")
  }

  test("IVF partitioned layout prunes files via partition filters") {
    val model = Ann.trainIvf(emb, "embedding", cells = 16)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Ann.writePartitioned(emb, "embedding", "vec_id", model, path)
    val q = Ann.searchPartitioned(spark, path, "embedding", "vec_id",
      model, qv, nprobe = 4, k = 10)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("cell#"), plan)
    // partitioned search ≡ in-memory ivf search on the same model
    val a = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Ann.ivfSearch(emb, "embedding", "vec_id", model, qv, 4, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
  }

  test("IVF probing 4/16 cells keeps most of the exact top-10") {
    val model = Ann.trainIvf(emb, "embedding", cells = 16)
    val got = Ann.ivfSearch(emb, "embedding", "vec_id", model, qv, 4, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.size == 10)
    val recall = got.intersect(exactTop(10)).size / 10.0
    info(s"IVF recall@10 (nprobe=4/16) = $recall")
    assert(recall >= 0.3, s"IVF recall collapsed: $recall")
  }
}
