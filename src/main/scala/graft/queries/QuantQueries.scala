package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.functions.VectorFunctions._
import graft.quant.{BinaryQuant, ProductQuant, ScalarQuant}

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
    Q(
      "pq_search",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val cb = ProductQuant.train(emb, "embedding", D, m = 8, k = 16)
        ProductQuant.searchAdc(emb, "embedding", "vec_id", cb,
          hashVectorValues(7L, D), K)
      },
      None // k-means not SQL-reproducible; recall-gated in QuantSpec
    )
  )
}
