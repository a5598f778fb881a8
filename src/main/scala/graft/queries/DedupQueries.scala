package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.dedup.Dedup
import graft.functions.VectorFunctions._

/** Dedup catalog queries (exact, MinHash+LSH, SimHash, blocked n-gram
  * Jaccard, embedding near-dup). Pair outputs are top-N by similarity with
  * full (score, id, id) ordering so results are deterministic and
  * non-empty at every scale factor.
  */
object DedupQueries {
  private val TopN = 20

  val qs: Seq[Q] = Seq(
    Q(
      "dedup_exact",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("source"), md5(col("text").cast("binary")).as("h"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
               countDistinct("h").as("n_distinct"),
               (count(lit(1)) - countDistinct("h")).as("n_dups"))
          .orderBy("source"),
      Some(
        """SELECT source, count(*) AS n_docs,
          |       count(DISTINCT md5(text)) AS n_distinct,
          |       count(*) - count(DISTINCT md5(text)) AS n_dups
          |FROM documents GROUP BY source ORDER BY source""".stripMargin)
    ),
    Q(
      "dedup_minhash_lsh",
      (s, dir) => Dedup.minhashLshPairs(Tables.documents(s, dir), TopN),
      Some(Dedup.minhashLshPairsSql(TopN)),
      bench = true
    ),
    Q(
      "dedup_components",
      (s, dir) =>
        Dedup.nearDupComponents(Tables.documents(s, dir)).orderBy("doc_id"),
      Some(s"${Dedup.nearDupComponentsSql}\nORDER BY doc_id")
    ),
    Q(
      "dedup_simhash",
      (s, dir) => Dedup.simhash(Tables.documents(s, dir)).orderBy("doc_id"),
      Some(s"${Dedup.simhashSql}\nORDER BY doc_id"),
      bench = true
    ),
    Q(
      "dedup_jaccard",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val sh = Dedup.shingled(docs)
          .join(docs.select("doc_id", "source"), "doc_id")
          .persist() // both sides of the blocked self-join
        val a = sh.as("a")
        val b = sh.as("b")
        // Block on source: the join key makes Catalyst plan a hash join
        // on source, never a cartesian — the blocked all-pairs shape.
        a.join(b, col("a.source") === col("b.source") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.source").as("source"),
                  col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
                  col("a.shingles").as("sha"), col("b.shingles").as("shb"))
          // ni is multi-referenced below, which keeps it in its own
          // projection — one intersect per pair instead of two
          .withColumn("ni", size(array_intersect(col("sha"), col("shb"))))
          .select(col("source"), col("doc_a"), col("doc_b"),
                  round(col("ni").cast("double") /
                    (size(col("sha")) + size(col("shb")) - col("ni")), 6)
                    .as("jac"))
          .orderBy(desc("jac"), col("doc_a"), col("doc_b"))
          .limit(TopN)
      },
      Some(
        s"""WITH sh AS (${Dedup.shingledSql}),
           |shs AS (
           |  SELECT sh.doc_id, d.source, sh.shingles
           |  FROM sh JOIN documents d ON d.doc_id = sh.doc_id)
           |SELECT a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b,
           |       round(${Dedup.jaccardSql("a.shingles", "b.shingles")}, 6) AS jac
           |FROM shs a JOIN shs b
           |  ON a.source = b.source AND a.doc_id < b.doc_id
           |ORDER BY jac DESC, doc_a, doc_b LIMIT $TopN""".stripMargin)
    ),
    Q(
      "dedup_embedding",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val a = e.as("a")
        val b = e.as("b")
        // Block on label (coarse-cell analog); exact cosine inside blocks.
        a.join(b, col("a.label") === col("b.label") &&
            col("a.vec_id") < col("b.vec_id"))
          .select(col("a.label").as("label"),
                  col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
                  round(cosineDistance(col("a.embedding"), col("b.embedding")), 6)
                    .as("dist"))
          .orderBy(col("dist"), col("vec_a"), col("vec_b"))
          .limit(TopN)
      },
      Some(
        s"""SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
           |       round(${cosineDistanceSql("a.embedding", "b.embedding", Tables.EmbeddingDim)}, 6) AS dist
           |FROM embeddings a JOIN embeddings b
           |  ON a.label = b.label AND a.vec_id < b.vec_id
           |ORDER BY dist, vec_a, vec_b LIMIT $TopN""".stripMargin),
      bench = true
    ),
    // the composed training-data prep pipeline a 100 TB corpus runs
    // nightly: quality gate → language gate → near-dup keep-list
    // (keep doc == its component representative) → per-source summary.
    // Every stage is an already-oracled operator; this pins their
    // composition end-to-end.
    Q(
      "pipeline_corpus_prep",
      (s, dir) => {
        import graft.text.TextAnalysis._
        val docs = Tables.documents(s, dir)
        val kept = docs
          .select(col("doc_id"), col("source"), col("text"),
            round(qualityScore("text"), 6).as("quality"),
            langId("text").as("pred_lang"))
          .filter(col("quality") > 0.5 && col("pred_lang") === "en")
        val dupDrop = Dedup.nearDupComponents(docs)
          .filter(col("component") =!= col("doc_id"))
          .select("doc_id")
        kept
          .join(dupDrop, Seq("doc_id"), "left_anti")
          .select(col("source"), col("quality"),
            expr(s"size(${wordTokens("text")})").as("n_tokens"))
          .groupBy("source")
          // quality is 6-decimal-rounded: summing exact micro-units keeps
          // the average independent of partition/accumulation order
          // (a plain avg() of doubles flipped the 6th decimal between
          // engines on one group)
          .agg(count(lit(1)).as("n_docs"),
            sum(expr("cast(round(quality * 1000000) as bigint)")).as("q6"),
            sum("n_tokens").as("total_tokens"))
          .select(col("source"), col("n_docs"),
            round(col("q6") / 1000000.0 / col("n_docs"), 6).as("avg_quality"),
            col("total_tokens"))
          .orderBy("source")
      },
      Some {
        import graft.text.TextAnalysis._
        s"""WITH comp AS (${Dedup.nearDupComponentsSql}),
           |kept AS (
           |  SELECT doc_id, source,
           |         round(${qualityScoreSql("text")}, 6) AS quality,
           |         len(${wordTokensSql("text")}) AS n_tokens
           |  FROM documents
           |  WHERE round(${qualityScoreSql("text")}, 6) > 0.5
           |    AND ${langIdSql("text")} = 'en'
           |    AND doc_id NOT IN
           |        (SELECT doc_id FROM comp WHERE component <> doc_id))
           |SELECT source, count(*) AS n_docs,
           |       round(CAST(sum(CAST(round(quality * 1000000) AS BIGINT)) AS BIGINT)
           |             / 1000000.0 / count(*), 6) AS avg_quality,
           |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
           |FROM kept GROUP BY source ORDER BY source""".stripMargin
      }
    )
  )
}
