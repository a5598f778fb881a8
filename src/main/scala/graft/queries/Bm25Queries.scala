package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.bm25.Bm25
import graft.hybrid.HybridSearch
import graft.functions.VectorFunctions
import graft.text.TextAnalysis.wordTokensSql

/** BM25 keyword search, inverted-index stats, and the hybrid blend. */
object Bm25Queries {
  private val QueryTerms = Seq("spark", "join", "filter")
  private val K = 10
  private val D = Tables.EmbeddingDim

  val qs: Seq[Q] = Seq(
    Q(
      "bm25_search",
      (s, dir) => Bm25.search(s, Tables.documents(s, dir), QueryTerms, K),
      Some(Bm25.searchSql(QueryTerms, K)),
      bench = true
    ),
    Q(
      "bm25_index_stats",
      (s, dir) =>
        Bm25.postings(Tables.documents(s, dir))
          .groupBy("term")
          .agg(countDistinct("doc_id").as("df"),
               sum("tf").cast("long").as("total_tf"))
          .orderBy(desc("df"), col("term"))
          .limit(20),
      Some(
        s"""WITH tok AS (
           |  SELECT doc_id, unnest(${wordTokensSql("text")}) AS term FROM documents)
           |SELECT term, count(DISTINCT doc_id) AS df, count(*) AS total_tf
           |FROM tok GROUP BY term
           |ORDER BY df DESC, term LIMIT 20""".stripMargin)
    ),
    // keyword search + metadata filter (reference keyword_search,
    // hybrid_search.py:318-358 — but filtered BEFORE scoring: exact
    // filtered top-k instead of over-fetch + post-filter)
    Q(
      "bm25_filtered",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .filter(graft.filter.Eq("lang", "en").column)
        Bm25.search(s, docs, QueryTerms, K)
      },
      Some(Bm25.searchSql(QueryTerms, K,
        relation = "(SELECT * FROM documents WHERE lang = 'en')")),
    ),
    Q(
      "hybrid_search",
      (s, dir) => {
        val corpus = Tables.documents(s, dir)
          .join(Tables.embeddings(s, dir),
            col("doc_id") === col("vec_id"))
          .select("doc_id", "text", "embedding")
        HybridSearch.search(s, corpus, QueryTerms,
          VectorFunctions.hashVectorValues(5L, D), K, alpha = 0.6)
      },
      Some(HybridSearch.searchSql(QueryTerms, 5L, D, K, alpha = 0.6)),
      bench = true
    ),
    // alpha sweep (the reference's own test matrix, test_comprehensive
    // suite 5 runs 0.2/0.5/0.8): keyword-dominant and vector-dominant
    hybridAlpha(0.2), hybridAlpha(0.8)
  )

  private def hybridAlpha(alpha: Double): Q = Q(
    f"hybrid_search_a${(alpha * 10).toInt}%02d",
    (s, dir) => {
      val corpus = Tables.documents(s, dir)
        .join(Tables.embeddings(s, dir), col("doc_id") === col("vec_id"))
        .select("doc_id", "text", "embedding")
      HybridSearch.search(s, corpus, QueryTerms,
        VectorFunctions.hashVectorValues(5L, D), K, alpha)
    },
    Some(HybridSearch.searchSql(QueryTerms, 5L, D, K, alpha))
  )
}
