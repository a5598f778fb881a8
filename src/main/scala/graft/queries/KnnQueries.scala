package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.functions.VectorFunctions._
import graft.knn.Knn

/** Exact kNN over the `embeddings` testdata table, all three reference
  * metrics (`vectordb_optimized.py:49-53`), plus filtered and batch
  * variants. Query vectors are deterministic hash-vectors (keys 1..3) so
  * the DuckDB oracle reproduces them exactly.
  */
object KnnQueries {
  private val D = Tables.EmbeddingDim
  private val K = 10

  private def qvecSql(key: Int): String = hashVectorSql(key.toString, D)

  private def knnQ(name: String, metric: String, key: Int): Q = Q(
    name,
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Knn.search(e, col("embedding"), hashVectorLit(key, D), metric, K)
        .select("vec_id", "label", "score")
    },
    Some(
      s"""WITH q AS (SELECT ${qvecSql(key)} AS v)
         |SELECT vec_id, label,
         |       round(${Knn.distanceSql(metric, "embedding", "q.v", D)}, 6) AS score
         |FROM embeddings, q
         |ORDER BY score, vec_id LIMIT $K""".stripMargin),
    bench = true
  )

  val qs: Seq[Q] = Seq(
    knnQ("knn_cosine", "cosine", 1),
    knnQ("knn_l2", "l2", 2),
    knnQ("knn_ip", "ip", 3),
    // pre-filter (exact filtered top-k; reference over-fetches + post-filters,
    // which can under-fill — SURVEY.md §4)
    Q(
      "knn_filtered",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Knn.search(e, col("embedding"), hashVectorLit(1, D), "cosine", K,
            filter = Some(col("label") < 5))
          .select("vec_id", "label", "score")
      },
      Some(
        s"""WITH q AS (SELECT ${qvecSql(1)} AS v)
           |SELECT vec_id, label,
           |       round(${Knn.distanceSql("cosine", "embedding", "q.v", D)}, 6) AS score
           |FROM embeddings, q
           |WHERE label < 5
           |ORDER BY score, vec_id LIMIT $K""".stripMargin)
    ),
    // include_vectors projection (reference include_vector flag,
    // vectordb_optimized.py:425-465): return vector-derived columns with
    // the hits (norm here — arrays don't hash portably in the oracle)
    Q(
      "knn_with_vectors",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Knn.search(e, col("embedding"), hashVectorLit(1, D), "cosine", K)
          .withColumn("vec_norm",
            round(sqrt(vecDot(col("embedding"), col("embedding"))), 6))
          .select("vec_id", "label", "score", "vec_norm")
      },
      Some(
        s"""WITH q AS (SELECT ${qvecSql(1)} AS v)
           |SELECT vec_id, label,
           |       round(${Knn.distanceSql("cosine", "embedding", "q.v", D)}, 6) AS score,
           |       round(${normSql("embedding", D)}, 6) AS vec_norm
           |FROM embeddings, q
           |ORDER BY score, vec_id LIMIT $K""".stripMargin)
    ),
    // batch: 3 broadcast query vectors, per-query top-k via ranking window
    // (reference batch GEMM search, parallel_search.py:246-311)
    Q(
      "knn_batch",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val queries = s.range(1, 4).toDF("query_id")
          .withColumn("qvec", hashVector(col("query_id"), D))
        Knn.searchBatch(e, col("embedding"), queries, "cosine", K)
          .select("query_id", "vec_id", "label", "score")
          .orderBy("query_id", "score", "vec_id")
      },
      Some(
        s"""WITH q AS (
           |  SELECT qid AS query_id, ${hashVectorSql("qid", D)} AS v
           |  FROM (VALUES (1), (2), (3)) t(qid)),
           |scored AS (
           |  SELECT q.query_id, e.vec_id, e.label,
           |         round(${Knn.distanceSql("cosine", "e.embedding", "q.v", D)}, 6) AS score
           |  FROM embeddings e CROSS JOIN q)
           |SELECT query_id, vec_id, label, score FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |                               ORDER BY score, vec_id) AS rn
           |  FROM scored) WHERE rn <= $K
           |ORDER BY query_id, score, vec_id""".stripMargin),
      bench = true
    )
  )
}
