package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall gate for [[BucketGuard]]'s hot-bucket thinning (VERDICT r7
  * task #5). Above its cap the guard replaces a hot bucket's all-pairs
  * candidates with fsig-chains plus representative links — candidates
  * are THINNED, so a near-dup component could split if those particular
  * edges fail exact verification. This report measures what a dedup
  * consumer actually loses, on a corpus built to hit that exact case: a
  * boilerplate cluster of ~200 near-dup variants of one real document,
  * perturbed at varying positions so the cluster floods LSH buckets far
  * past the test cap with a MIX of full signatures (non-identical fsig —
  * the thinned cross-group path, not just identical-signature chains).
  *
  *  - `same_component_pairs`: of the duplicate pairs the UNGUARDED sweep
  *    places in one component, the fraction the guarded sweep still
  *    places in one component (the relation a keep-list consumes);
  *  - `components_intact`: the fraction of unguarded components that
  *    survive unsplit under the guard.
  *
  * Both gate with throwing floors like [[graft.knn.RecallReport]]
  * (GRAFT_RECALL_GATE=off to measure without gating). The eval corpus is
  * bounded (~240 docs) by construction, so the driver-side component
  * maps are k-row collects, not a scale risk.
  */
object NearDupRecall {
  /** Cap used for the guarded run — far below the boilerplate cluster
    * size so its buckets are thinned, far above every real-corpus bucket
    * so the rest of the sweep stays exact. */
  val EvalCap = 64
  private val Variants = 200
  private val RealDocs = 40
  private val BaseTokens = 60

  /** Measured on the synthetic hot-cluster corpus across
    * sf0.001/0.01/0.1: chain and representative edges connect documents
    * that are themselves near-dups of the same base (Jaccard ≈ 0.8 ≫
    * the 0.5 component threshold), so they verify and the cluster stays
    * whole — measured 1.0/1.0 at all three scales; floors leave margin
    * for corpus drift while still catching any real thinning
    * regression (a guard that dropped chain edges would send both to
    * ~0). */
  val Floors: Map[String, Double] = Map(
    "same_component_pairs" -> 0.9, "components_intact" -> 0.9)

  /** Deterministic eval corpus: `RealDocs` real documents plus
    * `Variants` near-dup variants of the token-richest real doc, each
    * variant swapping one token at a position that walks the document —
    * different positions flip different minhashes, so the cluster's
    * full signatures MIX inside its shared hot buckets. */
  def corpus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.core.Tables.documents(s, dir)
      .select(col("doc_id").cast("long"), col("text"))
    val base = docs
      .orderBy(size(split(col("text"), "\\s+")).desc, col("doc_id"))
      .limit(1).collect().headOption.getOrElse(throw new IllegalStateException(
        s"near_dup_recall: documents table at $dir is empty"))
    val toks0 = Dedup.tokensOf(base.getString(1)).take(BaseTokens)
    require(toks0.length >= 10,
      s"near_dup_recall: richest doc has only ${toks0.length} tokens")
    // pad short bases with DISTINCT fillers (identical fillers would
    // dedup to one shingle and collapse the perturbation geometry)
    val toks = toks0 ++ (toks0.length until BaseTokens).map(j => s"pad$j")
    val variants = (0 until Variants).map { i =>
      val p = (i * 13) % toks.length
      (1000000L + i, toks.updated(p, s"variant${i % 7}").mkString(" "))
    }
    docs.orderBy("doc_id").limit(RealDocs)
      .unionByName(variants.toDF("doc_id", "text"))
  }

  def report(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gate = !sys.env.get("GRAFT_RECALL_GATE").contains("off")
    val docs = corpus(s, dir).localCheckpoint()

    // sanity: the corpus must actually exercise the guarded path — a
    // bucket above the cap holding MORE THAN ONE full signature (the
    // thinned cross-group case), else the gate is vacuously green
    val hottest = Dedup.bandRows(Dedup.docSignatures(docs))
      .groupBy("band", "sig")
      .agg(count(lit(1)).as("n"), countDistinct("fsig").as("nf"))
      .orderBy(col("n").desc).limit(1).collect().headOption
      .getOrElse(throw new IllegalStateException(
        "near_dup_recall: corpus produced no band rows"))
    require(hottest.getLong(hottest.fieldIndex("n")) > EvalCap,
      s"near_dup_recall corpus: hottest bucket ${hottest} not above cap $EvalCap")
    require(hottest.getLong(hottest.fieldIndex("nf")) > 1,
      s"near_dup_recall corpus: hot bucket holds one fsig — not the mixed case")

    def compMap(cap: Int): Map[Long, Long] =
      Dedup.nearDupComponents(docs, bucketCap = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = compMap(Int.MaxValue) // unguarded: every bucket all-pairs
    val guarded = compMap(EvalCap)

    val tGroups = truth.toSeq.groupBy(_._2).values.map(_.map(_._1)).toSeq
    def pairsOf(n: Long) = n * (n - 1) / 2
    val totalPairs = tGroups.map(g => pairsOf(g.size.toLong)).sum
    // a doc the guarded sweep dropped entirely maps to a unique negative
    // label — it preserves no pairs and splits its component
    val preserved = tGroups.map(
      _.groupBy(id => guarded.getOrElse(id, -id)).values
        .map(g => pairsOf(g.size.toLong)).sum).sum
    val intact = tGroups.count(
      _.map(id => guarded.getOrElse(id, -id)).distinct.size == 1)
    val measured = Map(
      "same_component_pairs" ->
        (if (totalPairs == 0) 1.0 else preserved.toDouble / totalPairs),
      "components_intact" ->
        (if (tGroups.isEmpty) 1.0 else intact.toDouble / tGroups.size))

    val rows = measured.toSeq.sortBy(_._1).map { case (m, r) =>
      if (!gate) System.err.println(f"[near-dup-recall] $m = $r%.3f")
      require(!gate || r >= Floors(m),
        f"recall gate: near-dup $m = $r%.3f under floor ${Floors(m)} " +
          s"(guarded cap=$EvalCap vs unguarded, ${tGroups.size} components)")
      (m, r >= Floors(m))
    }
    rows.toDF("scenario", "recall_ok")
  }

  /** Constant oracle (the measured recall gates in-engine, like the
    * trained-ANN rows — the guarded candidate generation has no direct
    * SQL twin above the cap). */
  def reportSql: String =
    Floors.keys.toSeq.sorted
      .map(m => s"SELECT '$m' AS scenario, CAST(1 AS BOOLEAN) AS recall_ok")
      .mkString("\nUNION ALL\n") + "\nORDER BY scenario"
}
