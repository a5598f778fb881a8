package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextAnalysis.{wordTokens, wordTokensSql}

/** Multinomial Naive Bayes document classifier — the countable,
  * fully-oracle-able twin of the fastText-style linear quality/domain
  * classifier an LLM data pipeline runs (CCNet / GPT-3 filter shape:
  * score documents with a linear model over token counts; multinomial
  * NB IS that linear model with closed-form counted weights). Training
  * is therefore two map-side-combined count aggregates — no SGD, no
  * RNG, no driver loop — and scoring is one hash join on the token
  * stream plus a per-document argmax.
  *
  * Determinism: every per-term log-prob goes through micro-nat integer
  * rounding BEFORE the per-doc sum (the [[NgramLm]] discipline), so
  * scores are partition-order exact; the argmax breaks ties on the
  * lexicographically smallest label. Unseen (word, label) pairs get the
  * Laplace floor via a left join against the count table — zero counts
  * never silently drop a term.
  *
  * Scale shape: token explode is linear; the count aggregates combine
  * map-side; the label table (|labels| rows) and the per-label totals
  * broadcast; the scoring join fans each test token out |labels|× —
  * bounded by the label count, never by corpus size.
  */
object NaiveBayes {
  /** Laplace smoothing mass. */
  val Alpha = 1.0

  /** Held-out split: train on doc_id % `TestMod` != 0, classify the
    * rest — deterministic over the id space, no RNG. */
  val TestMod = 5

  /** Confusion matrix (actual, predicted, n_docs) of the held-out slice
    * under the model counted from the training slice. Test documents
    * with no word tokens are absent ("too short to classify" is the
    * upstream length gate's job, as with [[NgramLm.score]]). */
  def confusion(docs: DataFrame, textCol: String = "text",
      labelCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val train = docs.filter(col(idCol) % TestMod =!= 0)
    val test = docs.filter(col(idCol) % TestMod === 0)
    // ONE corpus-scale pass: the (label, word) count table. The barrier
    // sits HERE — vocabulary×labels-sized, not on the token stream (a
    // checkpointed token explode would materialize the whole corpus) —
    // and the per-label totals and vocabulary size derive from it for
    // free.
    val tw = train
      .selectExpr(labelCol, s"explode(${wordTokens(textCol)}) as w")
    val cw = tw.groupBy(labelCol, "w").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val ts = cw.groupBy(labelCol).agg(sum("c").as("t"))
    val v = cw.select("w").distinct().agg(count(lit(1)).as("v"))
    val pri = train.groupBy(labelCol).agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("n"))))
      .select(col(labelCol),
        expr("cast(round(ln(nd / n) * 1e6) as bigint)").as("prior6"))
    // Test tokens pre-aggregated to (doc, word, count) and MATERIALIZED
    // once (r17): the former token-stream shape fed the explode into
    // BOTH the distinct-words subtree and the scoring join, so every
    // test document was tokenized twice per action, and the scoring
    // join fanned out per token occurrence. Σ lp6 over occurrences
    // equals lp6 · count exactly (BIGINT arithmetic), so the scores —
    // and every downstream argmax — are unchanged.
    val swc = test.selectExpr(idCol, s"$labelCol as actual",
        s"explode(${wordTokens(textCol)}) as w")
      .groupBy(col(idCol), col("actual"), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    // per-(test word, label) smoothed log-probs: distinct test words ×
    // the (tiny, broadcast) label totals, zero counts via left join
    val lp = swc.select("w").distinct()
      .crossJoin(broadcast(ts.crossJoin(v)))
      .join(cw, Seq("w", labelCol), "left")
      .select(col("w"), col(labelCol),
        // CAST(alpha AS DOUBLE): a bare decimal literal is DECIMAL in
        // Spark SQL and the decimal division would round the quotient
        // before ln() — see NgramLm.logPSql
        expr(s"cast(round(ln((coalesce(c, 0) + cast($Alpha as double)) /" +
          s" (t + cast($Alpha as double) * v)) * 1e6) as bigint)")
          .as("lp6"))
    val scores = swc.join(lp, "w")
      .groupBy(col(idCol), col("actual"), col(labelCol))
      .agg(sum(col("lp6") * col("cnt")).as("s6"))
      .join(broadcast(pri), labelCol)
      .withColumn("score6", col("s6") + col("prior6"))
    val rank = Window.partitionBy(col(idCol))
      .orderBy(desc("score6"), col(labelCol))
    scores.withColumn("rn", row_number().over(rank))
      .filter(col("rn") === 1)
      .groupBy(col("actual"), col(labelCol).as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** DuckDB twin of [[confusion]] (unordered). */
  def confusionSql(textCol: String = "text", labelCol: String = "source",
      idCol: String = "doc_id"): String =
    s"""WITH tr AS (SELECT * FROM documents WHERE $idCol % $TestMod != 0),
       |te AS (SELECT * FROM documents WHERE $idCol % $TestMod = 0),
       |tw AS (SELECT $labelCol, unnest(${wordTokensSql(textCol)}) AS w
       |       FROM tr),
       |cw AS (SELECT $labelCol, w, count(*) AS c FROM tw GROUP BY 1, 2),
       |ts AS (SELECT $labelCol, count(*) AS t FROM tw GROUP BY 1),
       |v AS (SELECT count(DISTINCT w) AS v FROM tw),
       |pri AS (
       |  SELECT $labelCol, CAST(round(ln(count(*) /
       |           (SELECT count(*) FROM tr)) * 1e6) AS BIGINT) AS prior6
       |  FROM tr GROUP BY 1),
       |sw AS (SELECT $idCol, $labelCol AS actual,
       |              unnest(${wordTokensSql(textCol)}) AS w
       |       FROM te),
       |tws AS (SELECT DISTINCT w FROM sw),
       |lp AS (
       |  SELECT tws.w, ts.$labelCol,
       |         CAST(round(ln((coalesce(cw.c, 0) + $Alpha) /
       |                       (ts.t + $Alpha * v.v)) * 1e6) AS BIGINT) AS lp6
       |  FROM tws CROSS JOIN ts CROSS JOIN v
       |  LEFT JOIN cw ON cw.w = tws.w AND cw.$labelCol = ts.$labelCol),
       |sc AS (
       |  SELECT sw.$idCol, sw.actual, lp.$labelCol, sum(lp.lp6) AS s6
       |  FROM sw JOIN lp ON lp.w = sw.w GROUP BY 1, 2, 3),
       |p AS (
       |  SELECT $idCol, actual, $labelCol AS predicted,
       |         row_number() OVER (PARTITION BY $idCol
       |                            ORDER BY (s6 + pri.prior6) DESC,
       |                                     $labelCol) AS rn
       |  FROM sc JOIN pri USING ($labelCol))
       |SELECT actual, predicted, count(*) AS n_docs
       |FROM p WHERE rn = 1 GROUP BY 1, 2""".stripMargin
}
