package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.functions.VectorFunctions._
import graft.quant.{BinaryQuant, ProductQuant, ScalarQuant, StorageCompression}

/** Quantization catalog queries over `embeddings`: SQ train + approx
  * search, BQ thresholds + Hamming search (both DuckDB-oracled), and PQ
  * ADC search (MLlib k-means training → rows-only check + recall gate in
  * QuantSpec).
  */
object QuantQueries {
  private val D = Tables.EmbeddingDim
  private val K = 10

  val qs: Seq[Q] = Seq(
    Q(
      "sq_train",
      (s, dir) =>
        ScalarQuant.trainStats(Tables.embeddings(s, dir), "embedding")
          .select(col("pos"), round(col("mn"), 6).as("mn"),
                  round(col("mx"), 6).as("mx"))
          .orderBy("pos"),
      Some(
        s"""SELECT pos, round(mn, 6) AS mn, round(mx, 6) AS mx
           |FROM (${ScalarQuant.trainStatsSql("embeddings", "embedding", D)})
           |ORDER BY pos""".stripMargin)
    ),
    Q(
      "sq_search",
      (s, dir) =>
        ScalarQuant.searchL2(Tables.embeddings(s, dir), "embedding", "vec_id",
          hashVectorValues(7L, D), D, K),
      Some(ScalarQuant.searchL2Sql("embeddings", "embedding", "vec_id",
        hashVectorSql("7", D), D, K)),
      bench = true
    ),
    // the reference's other two SQ metrics (quantization.py:145-181):
    // cosine and dot over the reconstructed vectors, query quantized too
    Q(
      "sq_search_cosine",
      (s, dir) =>
        ScalarQuant.searchCosine(Tables.embeddings(s, dir), "embedding",
          "vec_id", hashVectorValues(7L, D), D, K),
      Some(ScalarQuant.searchCosineSql("embeddings", "embedding", "vec_id",
        hashVectorSql("7", D), D, K))
    ),
    Q(
      "sq_search_dot",
      (s, dir) =>
        ScalarQuant.searchDot(Tables.embeddings(s, dir), "embedding",
          "vec_id", hashVectorValues(7L, D), D, K),
      Some(ScalarQuant.searchDotSql("embeddings", "embedding", "vec_id",
        hashVectorSql("7", D), D, K))
    ),
    Q(
      "bq_train",
      (s, dir) =>
        BinaryQuant.thresholds(Tables.embeddings(s, dir), "embedding")
          .select(col("pos"), round(col("thr"), 6).as("thr"))
          .orderBy("pos"),
      Some(
        s"""SELECT pos, round(thr, 6) AS thr
           |FROM (${BinaryQuant.thresholdsSql("embeddings", "embedding", D)})
           |ORDER BY pos""".stripMargin)
    ),
    Q(
      "bq_search",
      (s, dir) =>
        BinaryQuant.searchHamming(Tables.embeddings(s, dir), "embedding",
          "vec_id", hashVectorValues(7L, D), D, K),
      Some(BinaryQuant.searchHammingSql("embeddings", "embedding", "vec_id",
        hashVectorSql("7", D), D, K)),
      bench = true
    ),
    // BQ with exact rescoring — the standard serving shape for 1-bit
    // codes (hamming is a coarse 64-level angular proxy with big tie
    // plateaus at the k boundary, so plain top-k recall sits ~0.2; a
    // 10x hamming shortlist reranked by true cosine recovers ~0.8 at a
    // 10x-smaller exact-scan cost than brute force). Shortlist and
    // rerank are both top-k plans; at scale the shortlist reads packed
    // words only (16 B/vector), vectors are touched for k*10 rows.
    Q(
      "bq_search_reranked",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val qv = hashVectorValues(7L, D)
        val short = BinaryQuant.searchHamming(emb, "embedding", "vec_id",
          qv, D, K * 10).select("vec_id")
        emb.join(short, "vec_id")
          .select(col("vec_id"),
            round(cosineDistance(col("embedding"), typedlit(qv)), 6)
              .as("score"))
          .orderBy("score", "vec_id")
          .limit(K)
      },
      Some(
        s"""WITH short AS (
           |  SELECT vec_id FROM (${BinaryQuant.searchHammingSql("embeddings",
                "embedding", "vec_id", hashVectorSql("7", D), D, K * 10)})),
           |q AS (SELECT ${hashVectorSql("7", D)} AS v)
           |SELECT e.vec_id,
           |       round(${graft.knn.Knn.distanceSql("cosine", "e.embedding",
                "q.v", D)}, 6) AS score
           |FROM embeddings e JOIN short USING (vec_id), q
           |ORDER BY score, vec_id LIMIT $K""".stripMargin)
    ),
    // memory accounting (reference quantization.py:183-194, 396-407,
    // 599-615): bytes per vector raw vs quantized, compression ratios
    Q(
      "quant_memory",
      (s, dir) =>
        Tables.embeddings(s, dir).agg(count(lit(1)).as("n")).selectExpr(
          "n",
          s"n * $D * 4 as raw_bytes",
          s"n * $D as sq_bytes",
          s"cast($D * 4 as double) / $D as sq_ratio",
          s"n * ${D / 8} as bq_bytes",
          s"cast($D * 4 as double) / ${D / 8} as bq_ratio",
          "n * 8 as pq_bytes",
          s"cast($D * 4 as double) / 8 as pq_ratio"),
      Some(
        s"""SELECT count(*) AS n,
           |  count(*) * $D * 4 AS raw_bytes,
           |  count(*) * $D AS sq_bytes,
           |  ($D * 4)::DOUBLE / $D AS sq_ratio,
           |  count(*) * ${D / 8} AS bq_bytes,
           |  ($D * 4)::DOUBLE / ${D / 8} AS bq_ratio,
           |  count(*) * 8 AS pq_bytes,
           |  ($D * 4)::DOUBLE / 8 AS pq_ratio
           |FROM embeddings""".stripMargin)
    ),
    // quantized-at-rest search: packed bits / codes stored once, searched
    // without the raw vectors (the 100 TB shape — 32×/4× fewer bytes
    // scanned); same arithmetic as the in-query forms, same oracles
    Q(
      "bq_index_search",
      (s, dir) =>
        graft.index.QuantIndex.searchBq(s, graft.index.Indexes.bqEmb(s, dir),
          "vec_id", hashVectorValues(7L, D), K),
      Some(BinaryQuant.searchHammingSql("embeddings", "embedding", "vec_id",
        hashVectorSql("7", D), D, K)),
      bench = true
    ),
    Q(
      "sq_index_search",
      (s, dir) =>
        graft.index.QuantIndex.searchSqL2(s, graft.index.Indexes.sqEmb(s, dir),
          "vec_id", hashVectorValues(7L, D), D, K),
      Some(ScalarQuant.searchL2Sql("embeddings", "embedding", "vec_id",
        hashVectorSql("7", D), D, K)),
      bench = true
    ),
    Q(
      "pq_index_search",
      (s, dir) =>
        graft.index.QuantIndex.searchPq(s, graft.index.Indexes.pqEmb(s, dir),
          "vec_id", hashVectorValues(7L, D), K),
      Some(ProductQuant.searchAdcSql("embeddings", "embedding", "vec_id",
        hashVectorSql("7", D), D, 8, 16, K)),
      bench = true
    ),
    // storage compression (binary_persistence.py:333-385): fp16/int8
    // encode-decode transforms; the summary pins sizes, ratios, and the
    // int8 reconstruction error (fp16 reconstruction is spec-gated —
    // no half floats in SQL)
    Q(
      "storage_compression",
      (s, dir) =>
        StorageCompression.summary(Tables.embeddings(s, dir), "embedding",
          "vec_id", D),
      Some(StorageCompression.summarySql("embeddings", "embedding", D))
    ),
    // PQ with the fixed deterministic codebooks: full encode + ADC oracle
    // (the trained-k-means path stays recall-gated in QuantSpec)
    Q(
      "pq_search",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val cb = ProductQuant.fixedCodebooks(D, 8, 16)
        ProductQuant.searchAdc(emb, "embedding", "vec_id", cb,
          hashVectorValues(7L, D), K)
      },
      Some(ProductQuant.searchAdcSql("embeddings", "embedding", "vec_id",
        hashVectorSql("7", D), D, 8, 16, K))
    ),
    // PQ with exact rescoring — ADC distance is quantized (codebook
    // distortion dominates on clusterless data), so like bq_search_
    // reranked the serving shape is a 10x ADC shortlist (codes column
    // only, m bytes/vector) reranked by true l2 over k*10 vectors
    Q(
      "pq_search_reranked",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val cb = ProductQuant.fixedCodebooks(D, 8, 16)
        val qv = hashVectorValues(7L, D)
        val short = ProductQuant.searchAdc(emb, "embedding", "vec_id", cb,
          qv, K * 10).select("vec_id")
        emb.join(short, "vec_id")
          .select(col("vec_id"),
            round(l2Distance(col("embedding"), typedlit(qv)), 6).as("score"))
          .orderBy("score", "vec_id")
          .limit(K)
      },
      Some(
        s"""WITH short AS (
           |  SELECT vec_id FROM (${ProductQuant.searchAdcSql("embeddings",
                "embedding", "vec_id", hashVectorSql("7", D), D, 8, 16,
                K * 10)})),
           |q AS (SELECT ${hashVectorSql("7", D)} AS v)
           |SELECT e.vec_id,
           |       round(${graft.knn.Knn.distanceSql("l2", "e.embedding",
                "q.v", D)}, 6) AS score
           |FROM embeddings e JOIN short USING (vec_id), q
           |ORDER BY score, vec_id LIMIT $K""".stripMargin)
    )
  )
}
