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

  val qs: Seq[Q] = Seq(
    // nightly shape: dedup the NEW batch against the standing corpus —
    // candidates from the MinHash (band, sig) bucket join between the
    // two sides (never new×corpus all-pairs), exact Jaccard on
    // collisions, one best corpus match per new doc
    Q(
      "dedup_incremental",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val bands = Dedup.lshBands(docs).localCheckpoint()
        val nw = bands.filter(col("doc_id") >= NewBatchFrom).as("n")
        val corpus = bands.filter(col("doc_id") < NewBatchFrom).as("c")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(desc("jac"), col("dup_of"))
        nw.join(corpus,
            col("n.band") === col("c.band") && col("n.sig") === col("c.sig"))
          .select(col("n.doc_id").as("doc_id"), col("c.doc_id").as("dup_of"),
            col("n.shingles").as("sha"), col("c.shingles").as("shb"))
          .dropDuplicates("doc_id", "dup_of")
          .withColumn("ni", Dedup.intersectSize(col("sha"), col("shb")))
          .withColumn("jac", round(col("ni").cast("double") /
            (size(col("sha")) + size(col("shb")) - col("ni")), 6))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("doc_id", "dup_of", "jac")
          .orderBy(desc("jac"), col("doc_id"))
          .limit(TopN)
      },
      Some(
        s"""WITH sh AS (${Dedup.shingledSql}),
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
        s"""WITH sh AS (${Dedup.shingledSql}),
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
    )
  )
}
