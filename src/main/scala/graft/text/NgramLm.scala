package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based bigram language model over a document corpus, for
  * model-based quality filtering (the CCNet/Gopher recipe: train a cheap
  * LM on the corpus, score each document's negative log-likelihood under
  * it, drop the high-perplexity tail).
  *
  * Training is two shuffled aggregates with map-side combine — bigram
  * counts `c(w1,w2)` and context counts `c(w1,·)` — so it scales
  * linearly in corpus size at 100 TB (the model is O(distinct bigrams),
  * itself frequency-prunable downstream). Scoring replays each
  * document's bigrams through two hash joins on the count tables; a hot
  * bigram key is a single count-side row, so the joins stay balanced
  * under AQE regardless of token skew.
  *
  * Smoothing is add-½ over a vocabulary of V distinct tokens:
  * `P(w2|w1) = (c(w1,w2) + 0.5) / (c(w1,·) + 0.5·V)`. Per-document NLL
  * is accumulated in exact micro-nat units (round(ln·1e6) summed as
  * BIGINT) so the result is independent of partition/accumulation order
  * and matches the DuckDB oracle bit-for-bit after rounding.
  *
  * Reference scope: fastpyvectordb has no LM scoring; this is part of
  * the training-data-pipeline extension surface (quality filtering at
  * corpus scale).
  */
object NgramLm {
  import TextAnalysis.{wordTokens, wordTokensSql}

  val Alpha = 0.5

  /** (doc_id, w1, w2) — one row per adjacent token pair. One tokenize
    * pass, zero shuffles (explode of two aligned array slices). */
  def bigrams(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .selectExpr(idCol, s"${wordTokens(textCol)} as __t")
      .filter(expr("size(__t) >= 2"))
      .selectExpr(idCol,
        "slice(__t, 1, size(__t) - 1) as __w1s",
        "slice(__t, 2, size(__t) - 1) as __w2s")
      .selectExpr(idCol, "explode(arrays_zip(__w1s, __w2s)) as __bg")
      .selectExpr(idCol, "__bg.__w1s as w1", "__bg.__w2s as w2")

  /** SQL twin of [[bigrams]] as a full statement (DuckDB: 1-based
    * inclusive slices + zipping parallel unnests). */
  def bigramsSql(textCol: String = "text", idCol: String = "doc_id"): String =
    s"""SELECT $idCol,
       |       unnest(__t[1:len(__t) - 1]) AS w1,
       |       unnest(__t[2:len(__t)]) AS w2
       |FROM (SELECT $idCol, ${wordTokensSql(textCol)} AS __t FROM documents)
       |WHERE len(__t) >= 2""".stripMargin

  /** The trained model joined row-wise: (w1, w2, c12, c1, v) — bigram
    * count, context count, and the vocabulary size V broadcast onto
    * every row from a one-row aggregate (no driver-side action). */
  def model(big: DataFrame, docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    val c2 = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = big.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = docs
      .selectExpr(s"explode(${wordTokens(textCol)}) as w")
      .agg(countDistinct("w").as("v"))
    c2.join(c1, "w1").crossJoin(broadcast(v))
  }

  /** Natural log of the smoothed conditional probability (identical
    * formula text evaluates in both engines — Spark and DuckDB `ln`).
    * The smoothing constant is spelled CAST($Alpha AS DOUBLE): a bare
    * decimal literal parses as DECIMAL in Spark SQL (DOUBLE in DuckDB),
    * and Spark's decimal division rounds the quotient to its result
    * scale before ln() sees it — a cross-engine drift of ~5e-14 per
    * term that a micro-nat boundary can amplify into a red row (the
    * text_drift_kl sf0.1 incident, round 8). The cast is a semantic
    * no-op in DuckDB and forces IEEE doubles end-to-end in Spark. */
  def logPSql(c12: String, c1: String, v: String): String =
    s"ln(($c12 + CAST($Alpha AS DOUBLE)) / " +
      s"($c1 + CAST($Alpha AS DOUBLE) * $v))"

  /** Per-document scoring: (doc_id, n_bigrams, nll, ppl). `nll` is the
    * mean negative log-prob in nats (micro-nat-exact), `ppl = exp(nll)`.
    * Documents with fewer than two tokens carry no bigrams and are
    * absent — "too short to score" is the upstream length gate's job. */
  def score(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // one tokenize+explode pass shared by c2, c1 and the scoring join
    // (GC-scoped barrier, same pattern as the dedup signatures)
    val big = bigrams(docs, textCol, idCol).localCheckpoint()
    val m = model(big, docs, textCol)
    // display mean in EXACT integer arithmetic (graft.core.ExactDisplay):
    // the former round(-slp6/1e6/n, 6) double path hit a cross-engine
    // round-tie once (1 ulp on 1/50k docs at the 10× corpus)
    val nll = graft.core.ExactDisplay.mean6("-slp6", "n_bigrams")
    big
      .join(m, Seq("w1", "w2"))
      .select(col(idCol),
        expr(s"cast(round(${logPSql("c12", "c1", "v")} * 1e6) as bigint)")
          .as("lp6"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("lp6").as("slp6"))
      .select(col(idCol), col("n_bigrams"), nll.as("nll"),
        round(exp(nll), 4).as("ppl"))
  }

  /** SQL twin of [[score]] (full statement, unordered). */
  def scoreSql(textCol: String = "text", idCol: String = "doc_id"): String =
    s"""WITH big AS (${bigramsSql(textCol, idCol)}),
       |c2 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
       |c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
       |v AS (
       |  SELECT count(DISTINCT w) AS v
       |  FROM (SELECT unnest(${wordTokensSql(textCol)}) AS w FROM documents)),
       |terms AS (
       |  SELECT big.$idCol,
       |         CAST(round(${logPSql("c2.c12", "c1.c1", "v.v")} * 1e6) AS BIGINT) AS lp6
       |  FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
       |agg AS (
       |  SELECT $idCol, count(*) AS n_bigrams, sum(lp6) AS slp6
       |  FROM terms GROUP BY 1)
       |SELECT $idCol, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       |       ${graft.core.ExactDisplay.mean6Sql("-slp6", "n_bigrams")} AS nll,
       |       round(exp(${graft.core.ExactDisplay
                .mean6Sql("-slp6", "n_bigrams")}), 4) AS ppl
       |FROM agg""".stripMargin
}
