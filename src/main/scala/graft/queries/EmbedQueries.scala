package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.embed.HashEmbedder
import graft.functions.VectorFunctions._
import graft.text.TextAnalysis

/** Text-first retrieval: embed the corpus with the deterministic hash
  * embedder, embed the query text driver-side with the same arithmetic,
  * exact cosine top-k — the reference's EmbeddingCollection.search path
  * (embeddings.py:521-609) with an end-to-end DuckDB oracle.
  */
object EmbedQueries {
  private val D = Tables.EmbeddingDim
  private val K = 10
  private val e = HashEmbedder(D)
  private val QueryText = "spark join filter query"

  val qs: Seq[Q] = Seq(
    Q(
      "embed_text_knn",
      (s, dir) => {
        val qv = typedlit(e.embedValue(QueryText))
        // served from the persistent docemb vectors table: the corpus is
        // embedded ONCE at index build (the reference's embed-on-add,
        // embeddings.py:521-609) and a text-kNN query is a stored-vector
        // scan + exact top-k — no per-query re-hash of the corpus
        s.read.parquet(s"${graft.index.Indexes.docEmb(s, dir)}/vectors")
          .withColumn("score", round(cosineDistance(col("embedding"), qv), 6))
          .select("doc_id", "score")
          .orderBy(col("score"), col("doc_id"))
          .limit(K)
      },
      Some {
        // The query text's key must be hashed by the oracle itself so both
        // engines derive the query vector from identical arithmetic.
        val qKey = TextAnalysis.charHashSql(s"'$QueryText'")
        val dist = cosineDistanceSql("emb", "q.v", D)
        s"""WITH q AS (SELECT ${hashVectorSql(s"($qKey)", D)} AS v),
           |d AS (SELECT doc_id, ${e.embedSql("text")} AS emb FROM documents)
           |SELECT doc_id, round($dist, 6) AS score
           |FROM d, q ORDER BY score, doc_id LIMIT $K""".stripMargin
      },
      bench = true
    )
  )
}
