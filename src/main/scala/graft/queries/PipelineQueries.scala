package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.dedup.Dedup

/** Training-data pipeline operators beyond the per-corpus sweeps:
  * incremental near-dup (a new batch against the standing corpus),
  * eval-set decontamination (shingle-level overlap flagging), and a
  * deterministic stratified train/val/test split. All integer-exact →
  * full DuckDB oracles.
  */
object PipelineQueries {
  /** Docs at or above this id play the "newly arrived batch" for the
    * incremental sweep (deterministic over the testdata id space). */
  private val NewBatchFrom = 400
  /** Eval-set doc ids for the decontamination sweep. */
  private val EvalIds = Seq(7, 42, 128, 256, 311)
  /** A train doc sharing at least this many distinct shingles with an
    * eval doc is flagged as contaminated (2 keeps the flag non-empty at
    * every testdata scale factor, incl. the shorter sf0.001 docs). */
  private val MinSharedShingles = 2
  private val TopN = 20
  /** Token budget per packed training sequence (pipeline_pack). */
  private val PackBudget = 4096
  /** Retrieval query text for the composed RAG entry. */
  private val RagQuery = "hash join shuffle partition"
  /** Chunk window / stride (tokens) for pipeline_chunk — W−S overlap. */
  private val ChunkTokens = 32
  private val ChunkStride = 24
  /** Per-source quota for pipeline_quota_sample. */
  private val QuotaPerSource = 5

  val qs: Seq[Q] = Seq(
    // nightly shape: dedup the NEW batch against the standing corpus —
    // candidates from the MinHash (band, sig) bucket join between the
    // two sides (never new×corpus all-pairs), exact Jaccard on
    // collisions, one best corpus match per new doc
    Q(
      "dedup_incremental",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val ds = Dedup.docSignatures(docs).localCheckpoint()
        val bands = Dedup.bandRows(ds)
        val nw = bands.filter(col("doc_id") >= NewBatchFrom).as("n")
        val corpus = bands.filter(col("doc_id") < NewBatchFrom).as("c")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(desc("jac"), col("dup_of"))
        val cand = nw.join(corpus,
            col("n.band") === col("c.band") && col("n.sig") === col("c.sig"))
          .select(col("n.doc_id").as("doc_id"), col("c.doc_id").as("dup_of"))
          .distinct()
        Dedup.scorePairs(cand, ds, "doc_id", "dup_of")
          // project the arrays away BEFORE the per-doc window: the
          // best-match exchange should carry three scalars, not shingles
          .select("doc_id", "dup_of", "jac")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("doc_id", "dup_of", "jac")
          .orderBy(desc("jac"), col("doc_id"))
          .limit(TopN)
      },
      Some(
        s"""WITH sh AS MATERIALIZED (${Dedup.shingledSql}),
           |${Dedup.bandsCtesSql},
           |cand AS (
           |  SELECT DISTINCT n.doc_id, c.doc_id AS dup_of
           |  FROM bands n JOIN bands c
           |    ON n.band = c.band AND n.sig = c.sig
           |  WHERE n.doc_id >= $NewBatchFrom AND c.doc_id < $NewBatchFrom),
           |pairs AS (
           |  SELECT cd.doc_id, cd.dup_of,
           |         round(${Dedup.jaccardSql("sa.shingles", "sb.shingles")}, 6) AS jac
           |  FROM cand cd
           |  JOIN sh sa ON sa.doc_id = cd.doc_id
           |  JOIN sh sb ON sb.doc_id = cd.dup_of),
           |best AS (
           |  SELECT doc_id, dup_of, jac,
           |         row_number() OVER (PARTITION BY doc_id
           |                            ORDER BY jac DESC, dup_of) AS rn
           |  FROM pairs)
           |SELECT doc_id, dup_of, jac FROM best WHERE rn = 1
           |ORDER BY jac DESC, doc_id LIMIT $TopN""".stripMargin)
    ),
    // decontamination: flag train docs sharing >= K distinct shingles
    // with any eval doc — the shingle hash is the JOIN KEY (inverted
    // n-gram join, shuffle on shingle), so the sweep is linear in total
    // shingle volume, never train×eval pairs
    Q(
      "pipeline_decontaminate",
      (s, dir) => {
        val sh = Dedup.shingled(Tables.documents(s, dir)).localCheckpoint()
        val evl = sh.filter(col("doc_id").isin(EvalIds: _*))
          .select(col("doc_id").as("eval_id"),
            explode(col("shingles")).as("h"))
        val train = sh.filter(!col("doc_id").isin(EvalIds: _*))
          .select(col("doc_id"), explode(col("shingles")).as("h"))
        train.join(evl, "h")
          .groupBy("doc_id", "eval_id")
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= MinSharedShingles)
          .orderBy(desc("n_shared"), col("doc_id"), col("eval_id"))
          .limit(TopN)
      },
      Some {
        val ids = EvalIds.mkString(", ")
        s"""WITH sh AS MATERIALIZED (${Dedup.shingledSql}),
           |ev AS (
           |  SELECT doc_id AS eval_id, unnest(shingles) AS h
           |  FROM sh WHERE doc_id IN ($ids)),
           |tr AS (
           |  SELECT doc_id, unnest(shingles) AS h
           |  FROM sh WHERE doc_id NOT IN ($ids))
           |SELECT tr.doc_id, ev.eval_id, count(*) AS n_shared
           |FROM tr JOIN ev ON tr.h = ev.h
           |GROUP BY tr.doc_id, ev.eval_id
           |HAVING count(*) >= $MinSharedShingles
           |ORDER BY n_shared DESC, doc_id, eval_id LIMIT $TopN""".stripMargin
      },
      bench = true
    ),
    // PII scrub: detect + redact emails/phones/IPv4 before anything else
    // reads the text (per-row regex passes, no shuffle — linear at
    // 100 TB). The synthetic corpus carries no PII, so a deterministic
    // doc_id-keyed injection seeds it first — the operator under test is
    // graft.text.Pii (patterns shared verbatim with the DuckDB oracle).
    Q(
      "pipeline_pii",
      (s, dir) => {
        import graft.text.Pii
        val aug = concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" call 555-"),
              lpad(((col("doc_id") * 7919) % 10000).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when(col("doc_id") % 13 === 0,
            concat(lit(" host 10."), (col("doc_id") % 256).cast("string"),
              lit(".0."), ((col("doc_id") * 31) % 256).cast("string")))
            .otherwise(lit("")))
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), aug.as("t2"))
          .select(col("source"),
            Pii.emailCount(col("t2")).as("ne"),
            Pii.phoneCount(col("t2")).as("np"),
            Pii.ipCount(col("t2")).as("ni"),
            (length(col("t2")) - length(Pii.redact(col("t2")))).as("dlen"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("ne").as("n_emails"),
            sum("np").as("n_phones"),
            sum("ni").as("n_ips"),
            sum(when(col("ne") + col("np") + col("ni") > 0, 1L)
              .otherwise(0L)).as("docs_flagged"),
            sum("dlen").as("chars_redacted"))
          .orderBy("source")
      },
      Some {
        import graft.text.Pii
        val aug = "text" +
          " || CASE WHEN doc_id % 7 = 0 THEN ' contact user' ||" +
          " CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END" +
          " || CASE WHEN doc_id % 11 = 0 THEN ' call 555-' ||" +
          " lpad(CAST((doc_id * 7919) % 10000 AS VARCHAR), 4, '0') ELSE '' END" +
          " || CASE WHEN doc_id % 13 = 0 THEN ' host 10.' ||" +
          " CAST(doc_id % 256 AS VARCHAR) || '.0.' ||" +
          " CAST((doc_id * 31) % 256 AS VARCHAR) ELSE '' END"
        s"""WITH aug AS (
           |  SELECT doc_id, source, $aug AS t2 FROM documents),
           |det AS (
           |  SELECT source,
           |         ${Pii.emailCountSql("t2")} AS ne,
           |         ${Pii.phoneCountSql("t2")} AS np,
           |         ${Pii.ipCountSql("t2")} AS ni,
           |         length(t2) - length(${Pii.redactSql("t2")}) AS dlen
           |  FROM aug)
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(ne) AS BIGINT) AS n_emails,
           |       CAST(sum(np) AS BIGINT) AS n_phones,
           |       CAST(sum(ni) AS BIGINT) AS n_ips,
           |       CAST(sum(CASE WHEN ne + np + ni > 0 THEN 1 ELSE 0 END) AS BIGINT)
           |         AS docs_flagged,
           |       CAST(sum(dlen) AS BIGINT) AS chars_redacted
           |FROM det GROUP BY source ORDER BY source""".stripMargin
      },
      bench = true
    ),
    // sequence packing: fill fixed token-budget bins per source in
    // doc_id order (running-sum window partitioned BY SOURCE — the
    // packing parallelizes across sources/shards instead of one global
    // sort) — the batch-shaping pass between curation and tokenization.
    Q(
      "pipeline_pack",
      (s, dir) => {
        import graft.text.TextAnalysis.wordTokens
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        Tables.documents(s, dir)
          .selectExpr("doc_id", "source",
            s"size(${wordTokens("text")}) as n_tokens")
          .withColumn("prev", coalesce(sum("n_tokens").over(w), lit(0L)))
          .withColumn("bin",
            floor(col("prev") / lit(PackBudget.toDouble)).cast("long"))
          .groupBy("source", "bin")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
          .orderBy("source", "bin")
      },
      Some {
        import graft.text.TextAnalysis.wordTokensSql
        s"""WITH d AS (
           |  SELECT doc_id, source, len(${wordTokensSql("text")}) AS n_tokens
           |  FROM documents),
           |c AS (
           |  SELECT source, n_tokens,
           |         coalesce(sum(n_tokens) OVER (
           |           PARTITION BY source ORDER BY doc_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |           AS prev
           |  FROM d)
           |SELECT source, CAST(floor(prev / ${PackBudget}.0) AS BIGINT) AS bin,
           |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
           |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      },
      bench = true
    ),
    // domain mixing: deterministic per-source sampling rates (src0 keeps
    // 100%, src9 keeps 10%) via the same affine id hash as the split —
    // rerun/partitioning/engine stable, no RNG state to coordinate
    // across 1000 executors.
    Q(
      "pipeline_sample",
      (s, dir) => {
        import graft.text.TextAnalysis.wordTokens
        Tables.documents(s, dir)
          .selectExpr("doc_id", "source",
            s"size(${wordTokens("text")}) as n_tokens")
          .withColumn("keep_pct",
            lit(100) - lit(10) * substring(col("source"), 4, 10).cast("int"))
          .withColumn("keep",
            (col("doc_id") * Dedup.Knuth) % Dedup.P % 100 < col("keep_pct"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("keep"), col("n_tokens")).otherwise(0L))
              .as("kept_tokens"))
          .orderBy("source")
      },
      Some {
        import graft.text.TextAnalysis.wordTokensSql
        s"""WITH d AS (
           |  SELECT doc_id, source, len(${wordTokensSql("text")}) AS n_tokens,
           |         100 - 10 * CAST(substr(source, 4) AS INTEGER) AS keep_pct
           |  FROM documents)
           |SELECT source, count(*) AS n_total,
           |       CAST(sum(CASE WHEN (doc_id * ${Dedup.Knuth}) % ${Dedup.P} % 100
           |                          < keep_pct THEN 1 ELSE 0 END) AS BIGINT)
           |         AS n_kept,
           |       CAST(sum(CASE WHEN (doc_id * ${Dedup.Knuth}) % ${Dedup.P} % 100
           |                          < keep_pct THEN n_tokens ELSE 0 END) AS BIGINT)
           |         AS kept_tokens
           |FROM d GROUP BY source ORDER BY source""".stripMargin
      }
    ),
    // referential-integrity audit between the document and embedding
    // tables — the data-contract check an ingest runs before serving
    // (every doc embedded? orphan vectors? duplicate keys?). Two
    // anti-joins plus two key-cardinality aggregates, all combinable.
    Q(
      "pipeline_integrity_audit",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"))
        val emb = Tables.embeddings(s, dir)
          .select(col("vec_id").as("doc_id"))
        val missingEmb = docs.join(emb, Seq("doc_id"), "left_anti")
          .agg(count(lit(1)).as("docs_without_embedding"))
        val orphanVec = emb.join(docs, Seq("doc_id"), "left_anti")
          .agg(count(lit(1)).as("orphan_embeddings"))
        val dupDocs = docs.groupBy("doc_id").agg(count(lit(1)).as("c"))
          .agg(sum(when(col("c") > 1, 1L).otherwise(0L))
            .as("duplicate_doc_keys"))
        val dupVecs = emb.groupBy("doc_id").agg(count(lit(1)).as("c"))
          .agg(sum(when(col("c") > 1, 1L).otherwise(0L))
            .as("duplicate_vec_keys"))
        docs.agg(count(lit(1)).as("n_docs"))
          .crossJoin(broadcast(emb.agg(count(lit(1)).as("n_embeddings"))))
          .crossJoin(broadcast(missingEmb))
          .crossJoin(broadcast(orphanVec))
          .crossJoin(broadcast(dupDocs))
          .crossJoin(broadcast(dupVecs))
      },
      Some(
        """SELECT
          |  (SELECT count(*) FROM documents) AS n_docs,
          |  (SELECT count(*) FROM embeddings) AS n_embeddings,
          |  CAST((SELECT count(*) FROM documents d
          |        WHERE NOT EXISTS (SELECT 1 FROM embeddings e
          |                          WHERE e.vec_id = d.doc_id))
          |       AS BIGINT) AS docs_without_embedding,
          |  CAST((SELECT count(*) FROM embeddings e
          |        WHERE NOT EXISTS (SELECT 1 FROM documents d
          |                          WHERE d.doc_id = e.vec_id))
          |       AS BIGINT) AS orphan_embeddings,
          |  CAST((SELECT count(*) FROM (
          |          SELECT doc_id FROM documents GROUP BY doc_id
          |          HAVING count(*) > 1) t) AS BIGINT)
          |    AS duplicate_doc_keys,
          |  CAST((SELECT count(*) FROM (
          |          SELECT vec_id FROM embeddings GROUP BY vec_id
          |          HAVING count(*) > 1) t) AS BIGINT)
          |    AS duplicate_vec_keys""".stripMargin)
    ),
    // corpus snapshot diff — the "what changed since the last crawl"
    // report an incremental ingest runs before reprocessing: previous
    // snapshot is derived deterministically from the current one
    // (doc_id%10==3 rows are newly added, %10==6 texts were edited,
    // %10==9 rows also existed under a retired id that has since been
    // removed), then one full-outer join on doc_id comparing content
    // hashes classifies every row. One shuffle on the id, counters
    // combine map-side.
    Q(
      "pipeline_snapshot_diff",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val cur = docs.select(col("doc_id"), col("source").as("sc"),
          md5(col("text").cast("binary")).as("hc"))
        val prev = docs.filter(col("doc_id") % 10 =!= 3)
          .select(col("doc_id"), col("source").as("sp"),
            md5(when(col("doc_id") % 10 === 6, concat(col("text"), lit(" v2")))
              .otherwise(col("text")).cast("binary")).as("hp"))
          .union(docs.filter(col("doc_id") % 10 === 9)
            .select((col("doc_id") + 1000000).as("doc_id"),
              col("source").as("sp"),
              md5(col("text").cast("binary")).as("hp")))
        cur.join(prev, Seq("doc_id"), "full_outer")
          .select(coalesce(col("sc"), col("sp")).as("source"),
            when(col("hp").isNull, "added")
              .when(col("hc").isNull, "removed")
              .when(col("hc") =!= col("hp"), "changed")
              .otherwise("unchanged").as("status"))
          .groupBy("source")
          .agg(
            sum(when(col("status") === "added", 1L).otherwise(0L))
              .as("n_added"),
            sum(when(col("status") === "removed", 1L).otherwise(0L))
              .as("n_removed"),
            sum(when(col("status") === "changed", 1L).otherwise(0L))
              .as("n_changed"),
            sum(when(col("status") === "unchanged", 1L).otherwise(0L))
              .as("n_unchanged"))
          .orderBy("source")
      },
      Some(
        """WITH cur AS (SELECT doc_id, source, md5(text) AS h FROM documents),
          |prev AS (
          |  SELECT doc_id, source,
          |         md5(CASE WHEN doc_id % 10 = 6 THEN text || ' v2'
          |                  ELSE text END) AS h
          |  FROM documents WHERE doc_id % 10 != 3
          |  UNION ALL
          |  SELECT doc_id + 1000000, source, md5(text)
          |  FROM documents WHERE doc_id % 10 = 9),
          |j AS (
          |  SELECT coalesce(c.source, p.source) AS source,
          |         CASE WHEN p.h IS NULL THEN 'added'
          |              WHEN c.h IS NULL THEN 'removed'
          |              WHEN c.h != p.h THEN 'changed'
          |              ELSE 'unchanged' END AS status
          |  FROM cur c FULL OUTER JOIN prev p ON c.doc_id = p.doc_id)
          |SELECT source,
          |  CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)
          |       AS BIGINT) AS n_added,
          |  CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)
          |       AS BIGINT) AS n_removed,
          |  CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)
          |       AS BIGINT) AS n_changed,
          |  CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END)
          |       AS BIGINT) AS n_unchanged
          |FROM j GROUP BY source ORDER BY source""".stripMargin)
    ),
    // temperature-scaled source mixing (the α<1 upweighting of tail
    // sources every multi-source LLM corpus applies): keep rate per
    // source p_s = min(1, β·(n_max/n_s)^(1−α)) with α=0.5, β=0.5 — the
    // largest source keeps β, rarer sources keep proportionally more.
    // The rate table is source-count-sized (broadcast); the accept test
    // is the same deterministic affine-hash in integer million-units as
    // the other samplers, so reruns and repartitioning are stable and
    // the double-precision sqrt rounds identically in both engines via
    // floor(x + 0.5).
    Q(
      "pipeline_temperature_mix",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val counts = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
        val nmax = counts.agg(max("n_s").as("n_max"))
        val rates = counts.crossJoin(broadcast(nmax))
          .withColumn("p6", least(lit(1000000L),
            floor(lit(500000.0) * sqrt(col("n_max") / col("n_s")) + 0.5)
              .cast("long")))
          .select("source", "p6")
        docs.select("doc_id", "source")
          .join(broadcast(rates), "source")
          .withColumn("keep",
            (col("doc_id") * Dedup.Knuth) % Dedup.P % 1000000 < col("p6"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            round(min("p6") / 1000000.0, 6).as("rate"))
          .orderBy("source")
      },
      Some(
        s"""WITH c AS (SELECT source, count(*) AS n_s FROM documents
           |           GROUP BY source),
           |m AS (SELECT max(n_s) AS n_max FROM c),
           |r AS (SELECT source,
           |        least(1000000, CAST(floor(500000 * sqrt(n_max / n_s) + 0.5)
           |                            AS BIGINT)) AS p6
           |      FROM c CROSS JOIN m)
           |SELECT d.source, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN (d.doc_id * ${Dedup.Knuth}) % ${Dedup.P}
           |                     % 1000000 < r.p6
           |                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |  round(min(r.p6) / 1000000.0, 6) AS rate
           |FROM documents d JOIN r USING (source)
           |GROUP BY d.source ORDER BY source""".stripMargin)
    ),
    // decontamination, broadcast-Bloom form — the shape the exact-join
    // sweep takes at 100 TB: the eval side collapses to a Bloom filter
    // built from BUILT-INS (K xxhash64 bit positions per shingle,
    // bit_or word aggregate — order-independent, mergeable, map-side
    // combined), broadcast onto the train scan as a literal word array;
    // flagging is then a per-row membership probe with NO shuffle of
    // train shingles at all. Bloom membership has no false negatives,
    // so the flagged set is a SUPERSET of the exact ≥1-shared-shingle
    // set; the row gates exactly that in-engine (superset_ok) plus a
    // false-positive budget (precision_ok: ≤5% spurious docs at
    // 20 bits/item, K=4), oracle = TRUE.
    Q(
      "pipeline_decontaminate_bloom",
      (s, dir) => {
        val sh = Dedup.shingled(Tables.documents(s, dir)).localCheckpoint()
        // one materialization of the eval distinct-shingle set, reused by
        // the size probe, the filter build AND the exact-join gate below
        val evalSh = sh.filter(col("doc_id").isin(EvalIds: _*))
          .select(explode(col("shingles")).as("h")).distinct()
          .localCheckpoint()
        val nItems = math.max(1L, evalSh.count())
        val mBits = nItems * 20
        val nWords = ((mBits + 63) / 64).toInt
        val K = 4
        // build: K xxhash64 positions per item → (word, bitmask) →
        // bit_or per word (order-independent, map-side combined); the
        // finished filter is nWords longs — collected once (eval-sized,
        // bounded) and broadcast as a literal array
        val wordRows = evalSh
          .select(explode(array((0 until K).map(i =>
            pmod(xxhash64(col("h"), lit(i)), lit(mBits))): _*)).as("p"))
          .select((col("p") / lit(64)).cast("int").as("w"),
            expr("shiftleft(1L, cast(p % 64 as int))").as("mask"))
          .groupBy("w").agg(expr("bit_or(mask)").as("bits"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val bf = typedlit(Seq.tabulate(nWords)(i => wordRows.getOrElse(i, 0L)))
        val train = sh.filter(!col("doc_id").isin(EvalIds: _*))
        // probe: all K bits set, as one SQL lambda over the literal words
        val memberSql = (0 until K).map { i =>
          s"(element_at(bf, cast(pmod(xxhash64(gbh, $i), ${mBits}L) / 64 " +
            s"as int) + 1) & shiftleft(1L, " +
            s"cast(pmod(xxhash64(gbh, $i), ${mBits}L) % 64 as int))) != 0"
        }.mkString(" and ")
        val flagged = train
          .withColumn("bf", bf)
          .select(col("doc_id"),
            expr(s"exists(shingles, gbh -> $memberSql)").as("hit"))
          .filter(col("hit")).select("doc_id").localCheckpoint()
        val exact = train.select(col("doc_id"), explode(col("shingles")).as("h"))
          .join(evalSh, "h")
          .select("doc_id").distinct().localCheckpoint()
        val nFlagged = flagged.count()
        val nExact = exact.count()
        val missed = exact.join(flagged, Seq("doc_id"), "left_anti").count()
        val nTrain = train.count()
        val spark = s
        import spark.implicits._
        Seq((missed == 0L,
          (nFlagged - nExact).toDouble <= 0.05 * nTrain))
          .toDF("superset_ok", "precision_ok")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS superset_ok, " +
        "CAST(1 AS BOOLEAN) AS precision_ok")
    ),
    // cross-source contamination matrix: shared distinct shingles per
    // source pair — the corpus-level view of leakage between data
    // sources (e.g. a crawl that re-ingested a books dump). The join key
    // is the shingle hash over DISTINCT (source, shingle) rows, so a
    // shingle shared by S sources contributes S·(S−1)/2 pair rows, never
    // a per-document blowup; linear in distinct shingle volume at 100 TB.
    Q(
      "text_source_overlap",
      (s, dir) => {
        val sh = Dedup.shingled(Tables.documents(s, dir))
          .join(Tables.documents(s, dir).select("doc_id", "source"), "doc_id")
          .select(col("source"), explode(col("shingles")).as("h"))
          .distinct()
        val a = sh.as("a"); val b = sh.as("b")
        a.join(b, col("a.h") === col("b.h") &&
            col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
          .agg(count(lit(1)).as("n_shared"))
          .orderBy(desc("n_shared"), col("src_a"), col("src_b"))
          .limit(TopN)
      },
      Some(
        s"""WITH sh AS (${Dedup.shingledSql}),
           |sq AS MATERIALIZED (
           |  SELECT DISTINCT source, h FROM (
           |    SELECT d.source, unnest(s.shingles) AS h
           |    FROM sh s JOIN documents d USING (doc_id))),
           |pairs AS (
           |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
           |  FROM sq a JOIN sq b ON a.h = b.h AND a.source < b.source
           |  GROUP BY 1, 2)
           |SELECT src_a, src_b, CAST(n_shared AS BIGINT) AS n_shared
           |FROM pairs
           |ORDER BY n_shared DESC, src_a, src_b LIMIT $TopN""".stripMargin)
    ),
    // quality-proportional importance sampling: accept doc d iff
    // u(d) < quality(d), u = affine-hash uniform in [0,1) at 1e-6
    // resolution — the DSIR-style reweighting shape (resample the corpus
    // toward the target score distribution) with NO rng state: the
    // accept decision is a pure integer comparison, identical across
    // engines, partitionings and reruns. Per-row only; the one shuffle
    // is the per-source report.
    Q(
      "pipeline_importance_sample",
      (s, dir) => {
        import graft.text.TextAnalysis.qualityScore
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            round(qualityScore("text") * 1000000).cast("bigint").as("q6"))
          .withColumn("keep",
            (col("doc_id") * Dedup.Knuth) % Dedup.P % 1000000 < col("q6"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            graft.core.ExactDisplay.mean6(
              "sum(CASE WHEN keep THEN q6 ELSE 0 END)",
              "nullif(sum(CASE WHEN keep THEN 1 ELSE 0 END), 0)")
              .as("kept_avg_quality"),
            graft.core.ExactDisplay.mean6("sum(q6)", "count(1)")
              .as("avg_quality"))
          .orderBy("source")
      },
      Some {
        import graft.text.TextAnalysis.qualityScoreSql
        s"""WITH d AS (
           |  SELECT doc_id, source,
           |         CAST(round(${qualityScoreSql("text")} * 1000000) AS BIGINT) AS q6,
           |         (doc_id * ${Dedup.Knuth}) % ${Dedup.P} % 1000000 AS u6
           |  FROM documents)
           |SELECT source, count(*) AS n_total,
           |       CAST(sum(CASE WHEN u6 < q6 THEN 1 ELSE 0 END) AS BIGINT)
           |         AS n_kept,
           |       ${graft.core.ExactDisplay.mean6Sql(
                    "CAST(sum(CASE WHEN u6 < q6 THEN q6 ELSE 0 END) AS BIGINT)",
                    "nullif(sum(CASE WHEN u6 < q6 THEN 1 ELSE 0 END), 0)")}
           |         AS kept_avg_quality,
           |       ${graft.core.ExactDisplay.mean6Sql(
                    "CAST(sum(q6) AS BIGINT)", "count(*)")}
           |         AS avg_quality
           |FROM d GROUP BY source ORDER BY source""".stripMargin
      }
    ),
    // deterministic stratified split: bucket = affine hash of doc_id →
    // train/val/test, summarized per (source, split). Pure integer
    // arithmetic, so assignment is stable across engines, partitionings
    // and reruns — the property a reproducible training run needs.
    Q(
      "pipeline_split",
      (s, dir) => {
        val bucket = expr(
          s"(doc_id * ${Dedup.Knuth}L) % ${Dedup.P}L % 10")
        Tables.documents(s, dir)
          .withColumn("split",
            when(bucket < 8, "train").when(bucket === 8, "val")
              .otherwise("test"))
          .groupBy("source", "split")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("source", "split")
      },
      Some(
        s"""SELECT source,
           |  CASE WHEN (doc_id * ${Dedup.Knuth}) % ${Dedup.P} % 10 < 8 THEN 'train'
           |       WHEN (doc_id * ${Dedup.Knuth}) % ${Dedup.P} % 10 = 8 THEN 'val'
           |       ELSE 'test' END AS split,
           |  count(*) AS n_docs
           |FROM documents
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),
    // exact per-source quota sampling: take EXACTLY min(N, count) docs
    // per source, chosen by affine-hash order — deterministic across
    // engines/partitionings/reruns (the property a reproducible data mix
    // needs), one window per source, no RNG state. Emits the selected
    // doc ids so the downstream mix is pinned row-for-row.
    Q(
      "pipeline_quota_sample",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source")
          .orderBy(((col("doc_id") * Dedup.Knuth) % Dedup.P).as("h"),
            col("doc_id"))
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= QuotaPerSource)
          .select("source", "rn", "doc_id")
          .orderBy("source", "rn")
      },
      Some(
        s"""SELECT source, rn, doc_id FROM (
           |  SELECT source, doc_id,
           |         row_number() OVER (PARTITION BY source
           |           ORDER BY (doc_id * ${Dedup.Knuth}) % ${Dedup.P}, doc_id) AS rn
           |  FROM documents)
           |WHERE rn <= $QuotaPerSource ORDER BY source, rn""".stripMargin)
    ),
    // sliding token-window chunking — the doc→embedding-unit splitter of
    // an embedding/RAG ingest pipeline: W-token windows at stride S
    // (W−S-token overlap), final partial window kept. One tokenize pass,
    // one explode of the per-doc start offsets — linear in token volume
    // and embarrassingly parallel at 100 TB (no shuffle at all until the
    // output sort, which a real pipeline wouldn't do).
    Q(
      "pipeline_chunk",
      (s, dir) =>
        graft.text.Chunking.chunk(Tables.documents(s, dir), "text",
            "doc_id", ChunkTokens, ChunkStride, passthrough = Seq("source"))
          .select("doc_id", "source", "chunk_idx", "n_tokens", "chunk_text")
          .orderBy("doc_id", "chunk_idx"),
      Some {
        import graft.text.TextAnalysis._
        s"""WITH tk AS (
           |  SELECT doc_id, source, ${wordTokensSql("text")} AS t
           |  FROM documents),
           |st AS (
           |  SELECT doc_id, source, t,
           |         unnest(range(0, len(t), $ChunkStride)) AS st
           |  FROM tk WHERE len(t) > 0),
           |ch AS (
           |  SELECT doc_id, source, CAST(st // $ChunkStride AS INT) AS chunk_idx,
           |         t[st + 1 : st + $ChunkTokens] AS ctoks
           |  FROM st)
           |SELECT doc_id, source, chunk_idx, len(ctoks) AS n_tokens,
           |       array_to_string(ctoks, ' ') AS chunk_text
           |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin
      },
      bench = true
    ),
    // the composed RAG ingest + retrieval path end-to-end: sliding-window
    // chunking → deterministic hash embedding of every chunk (key
    // materialized once per row, then the LCG vector — the corpus-scale
    // discipline from HashEmbedder's own note) → exact cosine top-10
    // with provenance (doc_id, chunk_idx, source). Every stage is an
    // already-oracled operator; this pins their composition, and the
    // whole pipeline is scan → explode → per-row kernels →
    // TakeOrderedAndProject: zero shuffles before the final top-k.
    Q(
      "pipeline_rag_search",
      (s, dir) => {
        import graft.embed.HashEmbedder
        import graft.functions.VectorFunctions.cosineDistance
        val e = HashEmbedder(Tables.EmbeddingDim)
        val chunks = graft.text.Chunking.chunk(Tables.documents(s, dir),
          "text", "doc_id", ChunkTokens, ChunkStride,
          passthrough = Seq("source"))
        val qv = typedlit(e.embedValue(RagQuery))
        chunks
          .withColumn("key", e.textKey("chunk_text"))
          .withColumn("emb", e.embedKey(col("key")))
          .withColumn("score", round(cosineDistance(col("emb"), qv), 6))
          .select("doc_id", "chunk_idx", "source", "score")
          .orderBy(col("score"), col("doc_id"), col("chunk_idx"))
          .limit(10)
      },
      Some {
        import graft.text.TextAnalysis._
        import graft.embed.HashEmbedder
        import graft.functions.VectorFunctions
        val D = Tables.EmbeddingDim
        val e = HashEmbedder(D)
        val qKey = charHashSql(s"'$RagQuery'")
        s"""WITH tk AS (
           |  SELECT doc_id, source, ${wordTokensSql("text")} AS t
           |  FROM documents),
           |st AS (
           |  SELECT doc_id, source, t,
           |         unnest(range(0, len(t), $ChunkStride)) AS st
           |  FROM tk WHERE len(t) > 0),
           |ch AS (
           |  SELECT doc_id, source, CAST(st // $ChunkStride AS INT) AS chunk_idx,
           |         array_to_string(t[st + 1 : st + $ChunkTokens], ' ')
           |           AS chunk_text
           |  FROM st),
           |q AS (SELECT ${VectorFunctions.hashVectorSql(s"($qKey)", D)} AS v),
           |d AS MATERIALIZED (SELECT doc_id, source, chunk_idx,
           |             ${e.embedSql("chunk_text")} AS emb
           |      FROM ch)
           |SELECT doc_id, chunk_idx, source,
           |       round(${VectorFunctions
                .cosineDistanceSql("emb", "q.v", D)}, 6) AS score
           |FROM d, q
           |ORDER BY score, doc_id, chunk_idx LIMIT 10""".stripMargin
      },
      bench = true
    ),
    // decontamination, near-match form: the exact-shingle sweep above
    // misses paraphrased/lightly-edited leakage, so this one routes
    // train×eval candidate pairs through the MinHash (band, sig) bucket
    // join — identical machinery to dedup_incremental, with the eval
    // slice (doc_id % 10 = 7, ~10% of the corpus) as the right side —
    // and scores exact Jaccard on collisions only. Never train×eval
    // all-pairs, so eval-set size doesn't gate corpus scale.
    Q(
      "pipeline_decontaminate_fuzzy",
      (s, dir) => {
        val ds = Dedup.docSignatures(Tables.documents(s, dir)).localCheckpoint()
        val bands = Dedup.bandRows(ds)
        val ev = bands.filter(col("doc_id") % 10 === 7).as("e")
        val tr = bands.filter(col("doc_id") % 10 =!= 7).as("t")
        val cand = tr.join(ev,
            col("t.band") === col("e.band") && col("t.sig") === col("e.sig"))
          .select(col("t.doc_id").as("doc_id"), col("e.doc_id").as("eval_id"))
          .distinct()
        Dedup.scorePairs(cand, ds, "doc_id", "eval_id")
          .select("doc_id", "eval_id", "jac")
          .orderBy(desc("jac"), col("doc_id"), col("eval_id"))
          .limit(TopN)
      },
      Some(
        s"""WITH sh AS MATERIALIZED (${Dedup.shingledSql}),
           |${Dedup.bandsCtesSql},
           |cand AS (
           |  SELECT DISTINCT t.doc_id, e.doc_id AS eval_id
           |  FROM bands t JOIN bands e
           |    ON t.band = e.band AND t.sig = e.sig
           |  WHERE t.doc_id % 10 <> 7 AND e.doc_id % 10 = 7)
           |SELECT c.doc_id, c.eval_id,
           |       round(${Dedup.jaccardSql("sa.shingles", "sb.shingles")}, 6) AS jac
           |FROM cand c
           |JOIN sh sa ON sa.doc_id = c.doc_id
           |JOIN sh sb ON sb.doc_id = c.eval_id
           |ORDER BY jac DESC, c.doc_id, c.eval_id LIMIT $TopN""".stripMargin)
    ),
    // the per-source "data card" a corpus release ships with: volume,
    // token mass, mean quality, language purity, exact-dup rate, mean
    // length — every signal an already-oracled kernel, composed into ONE
    // groupBy(source) so the whole card is a single shuffle at 100 TB.
    // Ratio averages go through exact integer sums (micro-units for the
    // rounded quality kernel, plain counts elsewhere) so the card is
    // independent of partition order.
    Q(
      "pipeline_data_card",
      (s, dir) => {
        import graft.text.TextAnalysis._
        Tables.documents(s, dir)
          .select(col("source"),
            expr(s"size(${wordTokens("text")})").as("nt"),
            round(qualityScore("text") * 1000000).cast("bigint").as("q6"),
            when(langId("text") === "en", 1L).otherwise(0L).as("is_en"),
            md5(col("text").cast("binary")).as("h"),
            length(col("text")).as("nc"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("nt").as("total_tokens"),
            graft.core.ExactDisplay.mean6("sum(q6)", "count(1)")
              .as("avg_quality"),
            round(sum("is_en") / count(lit(1)).cast("double"), 6).as("en_ratio"),
            round((count(lit(1)) - countDistinct("h")) /
              count(lit(1)).cast("double"), 6).as("dup_ratio"),
            round(sum("nc") / count(lit(1)).cast("double"), 4).as("avg_chars"))
          .orderBy("source")
      },
      Some {
        import graft.text.TextAnalysis._
        s"""WITH d AS (
           |  SELECT source,
           |         len(${wordTokensSql("text")}) AS nt,
           |         CAST(round(${qualityScoreSql("text")} * 1000000) AS BIGINT) AS q6,
           |         CASE WHEN ${langIdSql("text")} = 'en' THEN 1 ELSE 0 END AS is_en,
           |         md5(text) AS h,
           |         length(text) AS nc
           |  FROM documents)
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(nt) AS BIGINT) AS total_tokens,
           |       ${graft.core.ExactDisplay.mean6Sql(
                    "CAST(sum(q6) AS BIGINT)", "count(*)")}
           |         AS avg_quality,
           |       round(CAST(sum(is_en) AS BIGINT) / CAST(count(*) AS DOUBLE), 6)
           |         AS en_ratio,
           |       round((count(*) - count(DISTINCT h)) / CAST(count(*) AS DOUBLE), 6)
           |         AS dup_ratio,
           |       round(CAST(sum(nc) AS BIGINT) / CAST(count(*) AS DOUBLE), 4)
           |         AS avg_chars
           |FROM d GROUP BY source ORDER BY source""".stripMargin
      }
    )
  )
}
