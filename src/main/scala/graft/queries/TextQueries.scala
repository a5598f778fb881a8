package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.text.TextAnalysis._

/** Text-analysis catalog queries over the `documents` table: per-doc token
  * stats, quality scores, a language-ID confusion matrix, and rolling-hash
  * fingerprints. Per-row kernels, no shuffle except the final confusion-
  * matrix groupBy.
  */
object TextQueries {
  val qs: Seq[Q] = Seq(
    Q(
      "text_token_stats",
      (s, dir) =>
        // tokenize once: wt is referenced twice below so CollapseProject
        // keeps it as its own projection (single regex pass per row)
        Tables.documents(s, dir)
          .selectExpr("doc_id", "text", s"${wordTokens("text")} as wt")
          .selectExpr(
            "doc_id",
            s"size(${wsTokens("text")}) as n_ws_tokens",
            "size(wt) as n_word_tokens",
            "size(array_distinct(wt)) as n_distinct_terms",
            "length(text) as len_chars"),
      Some(
        s"""SELECT doc_id,
           |  len(${wsTokensSql("text")}) AS n_ws_tokens,
           |  len(${wordTokensSql("text")}) AS n_word_tokens,
           |  len(list_distinct(${wordTokensSql("text")})) AS n_distinct_terms,
           |  length(text) AS len_chars
           |FROM documents""".stripMargin),
      bench = true
    ),
    // per-source token-count distribution: exact interpolated quantiles
    // (Spark percentile == DuckDB quantile_cont, both the (n−1)·p linear
    // rule) — the corpus-profiling numbers a data curator reads before
    // setting length filters
    Q(
      "text_token_quantiles",
      (s, dir) =>
        Tables.documents(s, dir)
          .selectExpr("source", s"size(${wordTokens("text")}) as nt")
          .groupBy("source")
          .agg(
            round(expr("percentile(nt, 0.5)"), 6).as("p50"),
            round(expr("percentile(nt, 0.9)"), 6).as("p90"),
            round(expr("percentile(nt, 0.99)"), 6).as("p99"))
          .orderBy("source"),
      Some(
        s"""WITH n AS (
           |  SELECT source, len(${wordTokensSql("text")}) AS nt FROM documents)
           |SELECT source,
           |  round(quantile_cont(nt, 0.5), 6) AS p50,
           |  round(quantile_cont(nt, 0.9), 6) AS p90,
           |  round(quantile_cont(nt, 0.99), 6) AS p99
           |FROM n GROUP BY source ORDER BY source""".stripMargin)
    ),
    Q(
      "text_quality",
      (s, dir) =>
        Tables.documents(s, dir).select(
          col("doc_id"),
          round(stopwordRatio("text"), 6).as("stop_ratio"),
          round(meanTokenLen("text"), 6).as("mean_token_len"),
          round(qualityScore("text"), 6).as("quality")),
      Some(
        s"""SELECT doc_id,
           |  round(${stopwordRatioSql("text")}, 6) AS stop_ratio,
           |  round(${meanTokenLenSql("text")}, 6) AS mean_token_len,
           |  round(${qualityScoreSql("text")}, 6) AS quality
           |FROM documents""".stripMargin)
    ),
    Q(
      "text_langid",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("lang").as("actual"), langId("text").as("predicted"))
          .groupBy("actual", "predicted")
          .agg(count(lit(1)).as("n"))
          .orderBy("actual", "predicted"),
      Some(
        s"""SELECT lang AS actual, ${langIdSql("text")} AS predicted,
           |       count(*) AS n
           |FROM documents
           |GROUP BY 1, 2
           |ORDER BY 1, 2""".stripMargin)
    ),
    // text extraction from multiple string fields (reference
    // _extract_text, hybrid_search.py:266-281: concat string metadata
    // into one searchable text) — here customer name + segment
    Q(
      "text_extract",
      (s, dir) =>
        Tables.customer(s, dir)
          .selectExpr("c_custkey",
            "concat_ws(' ', c_name, c_mktsegment) as extracted")
          .selectExpr("c_custkey",
            s"size(${wordTokens("extracted")}) as n_tokens",
            "lower(extracted) as extracted_lower")
          .orderBy("c_custkey").limit(20),
      Some(
        s"""SELECT c_custkey,
           |  len(${wordTokensSql("concat_ws(' ', c_name, c_mktsegment)")}) AS n_tokens,
           |  lower(concat_ws(' ', c_name, c_mktsegment)) AS extracted_lower
           |FROM customer ORDER BY c_custkey LIMIT 20""".stripMargin)
    ),
    // corpus-level rollup of the per-doc quality kernels
    Q(
      "text_corpus_stats",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("lang"),
            stopwordRatio("text").as("sr"),
            qualityScore("text").as("q"),
            expr(s"size(${wordTokens("text")})").as("nt"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
               round(avg("sr"), 6).as("avg_stop_ratio"),
               round(avg("q"), 6).as("avg_quality"),
               round(avg("nt"), 4).as("avg_tokens"))
          .orderBy("lang"),
      Some(
        s"""SELECT lang, count(*) AS n_docs,
           |  round(avg(${stopwordRatioSql("text")}), 6) AS avg_stop_ratio,
           |  round(avg(${qualityScoreSql("text")}), 6) AS avg_quality,
           |  round(avg(len(${wordTokensSql("text")})), 4) AS avg_tokens
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
    ),
    // per-source character-class profile — the mojibake/garbage and
    // shouting/numeric-boilerplate signals of a corpus-cleaning sweep:
    // integer char-class counts summed per source (order-independent),
    // one division at the end. Ranges are written without regex escapes
    // ('[^ -~]' = non-printable-ASCII) so Java and RE2 read them alike.
    Q(
      "text_charset_stats",
      (s, dir) =>
        Tables.documents(s, dir)
          .selectExpr("source",
            "length(text) as nc",
            "length(regexp_replace(text, '[^ -~]', '')) as np",
            "length(regexp_replace(text, '[^0-9]', '')) as nd",
            "length(regexp_replace(text, '[^A-Z]', '')) as nu",
            "length(regexp_replace(text, '[^A-Za-z]', '')) as na")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("nc").as("total_chars"),
            round(sum("np") / sum("nc"), 6).as("printable_ratio"),
            round(sum("nd") / sum("nc"), 6).as("digit_ratio"),
            round(sum("nu") / sum("nc"), 6).as("upper_ratio"),
            round(sum("na") / sum("nc"), 6).as("alpha_ratio"))
          .orderBy("source"),
      Some(
        """WITH c AS (
          |  SELECT source, length(text) AS nc,
          |         length(regexp_replace(text, '[^ -~]', '', 'g')) AS np,
          |         length(regexp_replace(text, '[^0-9]', '', 'g')) AS nd,
          |         length(regexp_replace(text, '[^A-Z]', '', 'g')) AS nu,
          |         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS na
          |  FROM documents)
          |SELECT source, count(*) AS n_docs,
          |       CAST(sum(nc) AS BIGINT) AS total_chars,
          |       round(CAST(sum(np) AS BIGINT) / CAST(sum(nc) AS BIGINT), 6)
          |         AS printable_ratio,
          |       round(CAST(sum(nd) AS BIGINT) / CAST(sum(nc) AS BIGINT), 6)
          |         AS digit_ratio,
          |       round(CAST(sum(nu) AS BIGINT) / CAST(sum(nc) AS BIGINT), 6)
          |         AS upper_ratio,
          |       round(CAST(sum(na) AS BIGINT) / CAST(sum(nc) AS BIGINT), 6)
          |         AS alpha_ratio
          |FROM c GROUP BY source ORDER BY source""".stripMargin)
    ),
    Q(
      "text_fingerprint",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), fingerprint("text").as("fp")),
      Some(
        s"""SELECT doc_id, ${fingerprintSql("text")} AS fp
           |FROM documents""".stripMargin),
      bench = true
    ),
    // Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    // duplicate-word fraction and most-common-bigram fraction per doc —
    // the filters that catch boilerplate and degenerate generations.
    // Bigram counting goes through explode + groupBy (distributed — the
    // per-doc bigram multiset never materializes as one row), then joins
    // back to the per-doc scalars.
    Q(
      "text_repetition",
      (s, dir) => {
        // r17 (guide §2.4 remove shuffles outright): the bigram
        // multiset lives entirely inside one row's token array, so its
        // max multiplicity is an in-row computation — sort the bigram
        // array, take the longest equal-adjacent run. The former shape
        // (explode → groupBy(doc,bg) → groupBy(doc) → join back to
        // base) shuffled the whole corpus bigram stream twice, joined,
        // and — because `base` fed both the explode branch and the
        // join — tokenized every document twice per action. Same
        // counts (string equality is string equality), same rows;
        // plan: 3 Exchange + 1 join → 1 map-only pass + TakeOrdered.
        Tables.documents(s, dir)
          .selectExpr("doc_id", "source", s"${wordTokens("text")} as t")
          .selectExpr("doc_id", "source", "t",
            "size(t) as n", "size(array_distinct(t)) as nd")
          .filter(col("n") >= 2) // before the bigram expr: sequence(0, n-2) needs n >= 2
          .selectExpr("doc_id", "source", "n", "nd",
            """aggregate(
                 array_sort(transform(sequence(0, size(t)-2),
                                      i -> concat(t[i], ' ', t[i+1]))),
                 named_struct('prev', cast(null as string),
                              'run', cast(0 as bigint),
                              'best', cast(0 as bigint)),
                 (a, x) -> named_struct(
                    'prev', x,
                    'run', if(a.prev <=> x, a.run + 1L, 1L),
                    'best', greatest(a.best,
                                     if(a.prev <=> x, a.run + 1L, 1L))),
                 a -> a.best) as top_bg""")
          .select(col("doc_id"), col("source"),
            round(lit(1.0) - col("nd").cast("double") / col("n"), 6)
              .as("dup_word_frac"),
            round(col("top_bg").cast("double") / (col("n") - 1), 6)
              .as("top_bigram_frac"))
          .orderBy(desc("dup_word_frac"), col("doc_id"))
          .limit(20)
      },
      Some(
        s"""WITH tok AS (
           |  SELECT doc_id, source, ${wordTokensSql("text")} AS t FROM documents),
           |base AS (
           |  SELECT doc_id, source, t, len(t) AS n, len(list_distinct(t)) AS nd
           |  FROM tok WHERE len(t) >= 2),
           |bg AS (
           |  SELECT doc_id,
           |         unnest(list_transform(range(len(t)-1),
           |                               i -> t[i+1] || ' ' || t[i+2])) AS bg
           |  FROM base),
           |bgc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
           |top AS (SELECT doc_id, max(c) AS top_bg FROM bgc GROUP BY 1)
           |SELECT b.doc_id, b.source,
           |       round(1.0::DOUBLE - nd::DOUBLE / n, 6) AS dup_word_frac,
           |       round(top_bg::DOUBLE / (n - 1), 6) AS top_bigram_frac
           |FROM base b JOIN top USING (doc_id)
           |ORDER BY dup_word_frac DESC, doc_id LIMIT 20""".stripMargin),
      bench = true
    ),
    // token accounting across the three tokenizers a pipeline actually
    // uses: whitespace (display), \w+ (indexing/BM25), and the BPE-ish
    // pre-tokenizer (training-budget estimation) — per source, with the
    // bpe-per-word inflation ratio curators use to convert corpus sizes
    // into training-token budgets
    Q(
      "text_bpe_stats",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("source"),
            expr(s"size(${wsTokens("text")})").as("nws"),
            expr(s"size(${wordTokens("text")})").as("nw"),
            size(graft.text.TextAnalysis.bpeTokens(col("text"))).as("nb"))
          .groupBy("source")
          .agg(sum("nws").as("ws_tokens"),
            sum("nw").as("word_tokens"),
            sum("nb").as("bpe_tokens"))
          .select(col("source"), col("ws_tokens"), col("word_tokens"),
            col("bpe_tokens"),
            round(col("bpe_tokens").cast("double") / col("word_tokens"), 6)
              .as("bpe_per_word"))
          .orderBy("source"),
      Some(
        s"""WITH d AS (
           |  SELECT source,
           |         len(${wsTokensSql("text")}) AS nws,
           |         len(${wordTokensSql("text")}) AS nw,
           |         len(${graft.text.TextAnalysis.bpeTokensSql("text")}) AS nb
           |  FROM documents),
           |agg AS (
           |  SELECT source,
           |         CAST(sum(nws) AS BIGINT) AS ws_tokens,
           |         CAST(sum(nw) AS BIGINT) AS word_tokens,
           |         CAST(sum(nb) AS BIGINT) AS bpe_tokens
           |  FROM d GROUP BY source)
           |SELECT source, ws_tokens, word_tokens, bpe_tokens,
           |       round(bpe_tokens::DOUBLE / word_tokens, 6) AS bpe_per_word
           |FROM agg ORDER BY source""".stripMargin)
    ),
    // corpus-profiling: the 3 most common bigrams per source (explode →
    // count → per-source top-k window) — the n-gram table a curator
    // scans for templated/boilerplate text before writing filters
    Q(
      "text_ngram_topk",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(desc("c"), col("bg"))
        Tables.documents(s, dir)
          .selectExpr("source", s"${wordTokens("text")} as t")
          .filter(size(col("t")) >= 2)
          .select(col("source"), explode(expr(
            "transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))"))
            .as("bg"))
          .groupBy("source", "bg").agg(count(lit(1)).as("c"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select("source", "rnk", "bg", "c")
          .orderBy("source", "rnk")
      },
      Some(
        s"""WITH tok AS (
           |  SELECT source, ${wordTokensSql("text")} AS t FROM documents),
           |bg AS (
           |  SELECT source,
           |         unnest(list_transform(range(len(t)-1),
           |                               i -> t[i+1] || ' ' || t[i+2])) AS bg
           |  FROM tok WHERE len(t) >= 2),
           |bgc AS (SELECT source, bg, count(*) AS c FROM bg GROUP BY 1, 2),
           |ranked AS (
           |  SELECT source, bg, c,
           |         row_number() OVER (PARTITION BY source
           |                            ORDER BY c DESC, bg) AS rnk
           |  FROM bgc)
           |SELECT source, CAST(rnk AS INTEGER) AS rnk, bg, CAST(c AS BIGINT) AS c
           |FROM ranked WHERE rnk <= 3 ORDER BY source, rnk""".stripMargin)
    ),
    // model-based quality filtering, step 1: the trained bigram LM's
    // head — the 20 most frequent bigrams with their smoothed
    // conditional log-probs (two map-side-combined aggregates; the
    // model is O(distinct bigrams), never per-document state)
    Q(
      "text_lm_train",
      (s, dir) => {
        import graft.text.NgramLm
        val docs = Tables.documents(s, dir)
        val big = NgramLm.bigrams(docs)
        NgramLm.model(big, docs)
          .select(col("w1"), col("w2"), col("c12"),
            round(expr(NgramLm.logPSql("c12", "c1", "v")), 6).as("logp"))
          .orderBy(desc("c12"), col("w1"), col("w2"))
          .limit(20)
      },
      Some {
        import graft.text.NgramLm
        s"""WITH big AS (${NgramLm.bigramsSql()}),
           |c2 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
           |c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
           |v AS (
           |  SELECT count(DISTINCT w) AS v
           |  FROM (SELECT unnest(${graft.text.TextAnalysis
                .wordTokensSql("text")}) AS w FROM documents))
           |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
           |       round(${NgramLm.logPSql("c2.c12", "c1.c1", "v.v")}, 6) AS logp
           |FROM c2 JOIN c1 USING (w1) CROSS JOIN v
           |ORDER BY c12 DESC, w1, w2 LIMIT 20""".stripMargin
      }
    ),
    // BPE merge learning (tokenizer training at corpus scale): ONE
    // distributed word-count job, then the incremental pair-index merge
    // loop driver-side over the vocabulary-sized table — 60 merges in
    // two jobs total (the old one-argmax-job-per-merge design capped at
    // toy merge counts). Gated in-engine against the naive
    // recount-everything reference implementation on the same table.
    Q(
      "text_bpe_train",
      (s, dir) => {
        import graft.text.BpeTrain
        val sample = Tables.documents(s, dir).filter(col("doc_id") < 100)
        // ONE corpus pass: the word-frequency table feeds both the
        // incremental learner and the driver-side reference twin
        val wordsDf = BpeTrain.wordCounts(sample, "text").localCheckpoint()
        val learned = BpeTrain.learnFromWords(wordsDf, iters = 60)
        val words = wordsDf.collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val ref = BpeTrain.referenceLearn(words, iters = 60)
        val spark = s
        import spark.implicits._
        Seq(learned == ref && learned.size == 60).toDF("merges_match")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS merges_match")
    ),
    // the APPLY half of the tokenizer: distributed corpus encode with
    // the learned merges. The per-symbol merge loop runs once per
    // DISTINCT word (vocabulary-sized, broadcast ranks); the corpus pass
    // is explode + hash-join + position-ordered reassembly. Gated
    // in-engine three ways: segmentation is lossless (concat of tokens
    // rebuilds every doc's words), the greedy lowest-rank encoder equals
    // the sequential reference apply on the whole vocabulary, and
    // merges genuinely compress (tokens < chars corpus-wide).
    Q(
      "text_bpe_encode",
      (s, dir) => {
        import graft.text.BpeTrain
        val sample = Tables.documents(s, dir).filter(col("doc_id") < 100)
        val wordsDf = BpeTrain.wordCounts(sample, "text").localCheckpoint()
        val merges = BpeTrain.learnFromWords(wordsDf, iters = 60)
        val enc = BpeTrain.encodeCorpus(sample, "text", merges)
          .localCheckpoint()
        val lossless = enc
          .join(sample.selectExpr("doc_id",
            s"array_join(${wordTokens("text")}, '') as flat"), "doc_id")
          .filter(expr("array_join(tokens, '') != flat"))
          .isEmpty
        val ranks = BpeTrain.ranksOf(merges)
        val twin = wordsDf.collect().map(_.getString(0)).forall { w =>
          BpeTrain.encodeWord(w, ranks).toVector ==
            BpeTrain.referenceEncodeWord(w, merges)
        }
        val Array(toks, chars) = enc
          .agg(sum("n_tokens"), sum(expr("aggregate(tokens, 0, (a, t) -> a + length(t))")))
          .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
        val spark = s
        import spark.implicits._
        Seq((lossless, twin, toks > 0 && toks < chars))
          .toDF("lossless", "matches_reference", "compresses")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS lossless, " +
        "CAST(1 AS BOOLEAN) AS matches_reference, " +
        "CAST(1 AS BOOLEAN) AS compresses")
    ),
    // robust per-source outlier detection on the quality score:
    // median/MAD (not mean/stddev — one garbage shard must not move the
    // gate), flag docs beyond 3 MADs. Two grouped exact percentiles
    // (Spark percentile ≡ DuckDB quantile_cont, parity pinned by
    // text_token_quantiles) joined back as broadcast scalars per source.
    Q(
      "text_quality_outliers",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            round(qualityScore("text"), 6).as("q"))
        val med = docs.groupBy("source")
          .agg(round(expr("percentile(q, 0.5)"), 6).as("med"))
        val dev = docs.join(broadcast(med), "source")
          .withColumn("ad", round(abs(col("q") - col("med")), 6))
        val mad = dev.groupBy("source")
          .agg(round(expr("percentile(ad, 0.5)"), 6).as("mad"))
        dev.join(broadcast(mad), "source")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            min("med").as("med"), min("mad").as("mad"),
            sum(when(col("ad") > lit(3) * col("mad"), 1L).otherwise(0L))
              .as("n_outliers"))
          .orderBy("source")
      },
      Some(
        s"""WITH d AS (
           |  SELECT doc_id, source,
           |         round(${qualityScoreSql("text")}, 6) AS q
           |  FROM documents),
           |med AS (SELECT source, round(quantile_cont(q, 0.5), 6) AS med
           |        FROM d GROUP BY 1),
           |dev AS (
           |  SELECT d.source, round(abs(d.q - med.med), 6) AS ad
           |  FROM d JOIN med USING (source)),
           |mad AS (SELECT source, round(quantile_cont(ad, 0.5), 6) AS mad
           |        FROM dev GROUP BY 1)
           |SELECT dev.source, count(*) AS n_docs,
           |       min(med.med) AS med, min(mad.mad) AS mad,
           |       CAST(sum(CASE WHEN dev.ad > 3 * mad.mad THEN 1 ELSE 0 END)
           |            AS BIGINT) AS n_outliers
           |FROM dev JOIN med USING (source) JOIN mad USING (source)
           |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    // distribution-drift monitoring: per-source KL(current ‖ reference)
    // over Laplace-smoothed token distributions, with the even/odd doc
    // halves standing in for yesterday/today snapshots. Two map-side-
    // combined count aggregates; every KL term is rounded to nano-nats
    // BEFORE the per-source sum so the result is partition-order exact
    // (the NgramLm discipline, one decimal deeper because terms are
    // tiny). The alarm a 100 TB ingest pipeline fires when a source's
    // token distribution shifts between refreshes.
    Q(
      "text_drift_kl",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val tok = docs.selectExpr("source", "doc_id % 2 as half",
          s"explode(${wordTokens("text")}) as w")
        // barrier on the vocabulary×source-sized count table (it feeds
        // both the totals and the term join — without it the corpus
        // explode+agg runs twice), same discipline as NaiveBayes
        val c = tok.groupBy("source", "w").agg(
          sum(when(col("half") === 0, 1L).otherwise(0L)).as("ca"),
          sum(when(col("half") === 1, 1L).otherwise(0L)).as("cb"))
          .localCheckpoint()
        val tot = c.groupBy("source").agg(
          sum("ca").as("ta"), sum("cb").as("tb"), count(lit(1)).as("v"))
        // the probabilities MUST be double arithmetic: a bare `1.0` in a
        // Spark SQL string parses as DECIMAL, making (cb + 1.0)/(tb + v)
        // a decimal division whose scale-rounded quotient feeds ln() —
        // ~3e-7 off DuckDB's pure-double quotient, which shifted per-term
        // nano-nats by ~±10 and (at sf0.1) walked one source's sum onto
        // the 6-decimal display boundary. CAST(1.0 AS DOUBLE) puts both
        // engines on identical IEEE doubles end-to-end; the 1e9 grid then
        // differs only on a sub-ulp ln() boundary, which the three-scale
        // oracle sweep shows never fires.
        c.join(tot, "source")
          .select(col("source"), col("ta"), col("tb"), col("v"),
            expr("cast(round((cb + cast(1.0 as double)) / (tb + v) * " +
              "ln(((cb + cast(1.0 as double)) / (tb + v)) / " +
              "((ca + cast(1.0 as double)) / (ta + v))) * 1e9)" +
              " as bigint)").as("t9"))
          .groupBy("source")
          .agg(min("ta").as("n_tokens_a"), min("tb").as("n_tokens_b"),
            min("v").as("vocab"), round(sum("t9") / 1e9, 6).as("kl"))
          .orderBy("source")
      },
      Some {
        import graft.text.TextAnalysis.wordTokensSql
        s"""WITH tok AS (
           |  SELECT source, doc_id % 2 AS half,
           |         unnest(${wordTokensSql("text")}) AS w
           |  FROM documents),
           |c AS (
           |  SELECT source, w,
           |         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ca,
           |         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS cb
           |  FROM tok GROUP BY 1, 2),
           |tot AS (SELECT source, sum(ca) AS ta, sum(cb) AS tb,
           |               count(*) AS v
           |        FROM c GROUP BY 1),
           |t AS (
           |  SELECT c.source,
           |         CAST(round((c.cb + 1.0) / (tot.tb + tot.v) *
           |           ln(((c.cb + 1.0) / (tot.tb + tot.v)) /
           |              ((c.ca + 1.0) / (tot.ta + tot.v))) * 1e9)
           |           AS BIGINT) AS t9
           |  FROM c JOIN tot USING (source))
           |SELECT t.source,
           |       CAST(min(tot.ta) AS BIGINT) AS n_tokens_a,
           |       CAST(min(tot.tb) AS BIGINT) AS n_tokens_b,
           |       CAST(min(tot.v) AS BIGINT) AS vocab,
           |       round(sum(t.t9) / 1e9, 6) AS kl
           |FROM t JOIN tot USING (source)
           |GROUP BY 1 ORDER BY 1""".stripMargin
      }
    ),
    // model-based domain classification: multinomial Naive Bayes, the
    // countable twin of the fastText-style linear filter (training =
    // two map-side-combined count aggregates, scoring = one hash join +
    // per-doc argmax; micro-nat-exact, deterministic tie-breaks).
    // Confusion matrix of the held-out doc_id % 5 == 0 slice.
    Q(
      "text_nb_classify",
      (s, dir) =>
        graft.text.NaiveBayes.confusion(Tables.documents(s, dir))
          .orderBy("actual", "predicted"),
      Some(s"${graft.text.NaiveBayes.confusionSql()}\n" +
        "ORDER BY actual, predicted"),
      bench = true
    ),
    // step 2: per-document NLL/perplexity under that LM — the
    // high-perplexity tail is what a CCNet-style pipeline drops. Scoring
    // is two hash joins on the count tables + one micro-nat-exact agg.
    Q(
      "text_lm_perplexity",
      (s, dir) =>
        graft.text.NgramLm.score(Tables.documents(s, dir)).orderBy("doc_id"),
      Some(s"${graft.text.NgramLm.scoreSql()}\nORDER BY doc_id"),
      bench = true
    ),
    // the LM-gated corpus prep a CCNet-style pipeline runs end-to-end:
    // perplexity-score every doc, keep the at-or-below-median-NLL half
    // that also clears the quality gate, report per source. Pins the
    // round's operators COMPOSED (LM scoring → relative threshold →
    // quality gate → data-card rollup); the median is a corpus-level
    // scalar broadcast onto the scan, micro-unit sums keep the report
    // partition-order exact.
    Q(
      "pipeline_corpus_prep_lm",
      (s, dir) => {
        import graft.text.NgramLm
        val docs = Tables.documents(s, dir)
        val scored = NgramLm.score(docs).localCheckpoint()
        val med = scored.agg(
          round(expr("percentile(nll, 0.5)"), 6).as("m"))
        val kept = scored
          .crossJoin(broadcast(med))
          .filter(col("nll") <= col("m"))
          .join(docs.select(col("doc_id"), col("source"),
            round(qualityScore("text"), 6).as("q")), "doc_id")
          .filter(col("q") > 0.5)
        kept
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(expr("cast(round(nll * 1000000) as bigint)")).as("nll6"),
            sum("n_bigrams").as("total_bigrams"))
          .select(col("source"), col("n_docs"),
            graft.core.ExactDisplay.mean6("nll6", "n_docs").as("avg_nll"),
            col("total_bigrams"))
          .orderBy("source")
      },
      Some {
        import graft.text.NgramLm
        s"""WITH scored AS (${NgramLm.scoreSql()}),
           |med AS (SELECT round(quantile_cont(nll, 0.5), 6) AS m FROM scored),
           |kept AS (
           |  SELECT s.source, sc.nll, sc.n_bigrams
           |  FROM scored sc
           |  CROSS JOIN med
           |  JOIN (SELECT doc_id, source,
           |               round(${graft.text.TextAnalysis
                  .qualityScoreSql("text")}, 6) AS q
           |        FROM documents) s USING (doc_id)
           |  WHERE sc.nll <= med.m AND s.q > 0.5)
           |SELECT source, count(*) AS n_docs,
           |       ${graft.core.ExactDisplay.mean6Sql(
                    "CAST(sum(CAST(round(nll * 1000000) AS BIGINT)) AS BIGINT)",
                    "count(*)")} AS avg_nll,
           |       CAST(sum(n_bigrams) AS BIGINT) AS total_bigrams
           |FROM kept GROUP BY source ORDER BY source""".stripMargin
      }
    )
  )
}
