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

  /** Measured on the synthetic hot-cluster corpora across
    * sf0.001/0.01/0.1: chain and representative edges connect members
    * that are themselves near-dups of the same base (shingle Jaccard
    * ≈ 0.8 ≫ the 0.5 component threshold; vector cosine distance
    * ≪ the 0.05 near-dup threshold), so they verify and the cluster
    * stays whole — measured 1.0/1.0 for both families at all three
    * scales; floors leave margin for corpus drift while still catching
    * any real thinning regression (a guard that dropped chain edges
    * would send them to ~0). The `emb_` rows pin the hyperplane-LSH
    * signature family — all four banded families (minhash, hyperplane,
    * phash, audio-fp) share the ONE BucketGuard.candidatePairs code
    * path, so the two signature geometries gated here cover the
    * mechanism the media families reuse. */
  val Floors: Map[String, Double] = Map(
    "same_component_pairs" -> 0.9, "components_intact" -> 0.9,
    "emb_same_component_pairs" -> 0.9, "emb_components_intact" -> 0.9)

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

  /** Cosine-distance threshold defining a vector near-dup for the
    * embedding-family scenario (variants measure ≤ ~0.04 from the base;
    * unrelated corpus vectors sit far above). */
  val EmbDupDistance = 0.05

  /** Deterministic vector corpus: `RealDocs` real embeddings plus
    * `Variants` near-dups of the first one, each perturbing ONE
    * coordinate (walking position, alternating sign, growing magnitude)
    * — big enough that some variants flip a hyperplane sign (mixed fsig
    * in the shared hot buckets), small enough that every variant stays
    * within [[EmbDupDistance]] of the base. */
  def vecCorpus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = graft.core.Tables.embeddings(s, dir)
      .select(col("vec_id").cast("long"), col("embedding"))
    val base = emb.orderBy("vec_id").limit(1).collect().headOption
      .getOrElse(throw new IllegalStateException(
        s"near_dup_recall: embeddings table at $dir is empty"))
      .getSeq[Float](1).toArray
    val variants = (0 until Variants).map { i =>
      val p = (i * 7) % base.length
      val eps = (0.01f + 0.15f * (i % 11) / 10f) *
        (if (i % 2 == 0) 1f else -1f)
      (1000000L + i, base.updated(p, base(p) + eps).toSeq)
    }
    emb.orderBy("vec_id").limit(RealDocs)
      .unionByName(variants.toDF("vec_id", "embedding"))
  }

  /** same-component pair recall + component intactness from two
    * (id → component) maps; an id the guarded sweep dropped entirely
    * maps to a unique negative label — preserves no pairs, splits its
    * component. */
  private def componentMetrics(truth: Map[Long, Long],
      guarded: Map[Long, Long]): (Double, Double, Int) = {
    val tGroups = truth.toSeq.groupBy(_._2).values.map(_.map(_._1)).toSeq
    def pairsOf(n: Long) = n * (n - 1) / 2
    val totalPairs = tGroups.map(g => pairsOf(g.size.toLong)).sum
    val preserved = tGroups.map(
      _.groupBy(id => guarded.getOrElse(id, -id)).values
        .map(g => pairsOf(g.size.toLong)).sum).sum
    val intact = tGroups.count(
      _.map(id => guarded.getOrElse(id, -id)).distinct.size == 1)
    (if (totalPairs == 0) 1.0 else preserved.toDouble / totalPairs,
      if (tGroups.isEmpty) 1.0 else intact.toDouble / tGroups.size,
      tGroups.size)
  }

  /** The corpus must actually exercise the guarded path — a bucket above
    * the cap holding MORE THAN ONE full signature (the thinned
    * cross-group case), else the gate is vacuously green. */
  private def requireMixedHotBucket(bands: DataFrame, keyCols: Seq[String],
      what: String): Unit = {
    val hottest = bands.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), countDistinct("fsig").as("nf"))
      .orderBy(col("n").desc).limit(1).collect().headOption
      .getOrElse(throw new IllegalStateException(
        s"near_dup_recall: $what corpus produced no band rows"))
    require(hottest.getLong(hottest.fieldIndex("n")) > EvalCap,
      s"near_dup_recall $what: hottest bucket $hottest not above cap $EvalCap")
    require(hottest.getLong(hottest.fieldIndex("nf")) > 1,
      s"near_dup_recall $what: hot bucket holds one fsig — not the mixed case")
  }

  /** Driver-side union-find components over a bounded verified pair
    * set (the embedding family has no engine component op). */
  private def unionFind(pairs: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      parent(find(a)) = find(b)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  def report(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gate = !sys.env.get("GRAFT_RECALL_GATE").contains("off")

    // ---- minhash shingle family: engine components, guarded vs not.
    // The minhash pass runs ONCE (r17): the mixed-bucket precondition
    // and both sweeps read the same materialized signature frame
    // instead of re-hashing the corpus three times.
    val docs = corpus(s, dir).localCheckpoint()
    val sigs = Dedup.docSignatures(docs).localCheckpoint()
    requireMixedHotBucket(
      Dedup.bandRows(sigs), Seq("band", "sig"), "minhash")
    def compMap(cap: Int): Map[Long, Long] =
      Dedup.nearDupComponents(docs, bucketCap = cap, sigs = Some(sigs))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // ---- hyperplane (embedding) family: guarded vs unguarded verified
    // pair graph → driver-side components (eval corpus is bounded)
    val D = graft.core.Tables.EmbeddingDim
    val vecs = vecCorpus(s, dir).localCheckpoint()
    // materialized once: the precondition probe and both guarded/
    // unguarded sweeps read the same band rows (r17)
    val vBands = graft.index.LshIndex
      .bucketRows(vecs, "embedding", "vec_id", D, withFullSig = true)
      .select("vec_id", "band_idx", "band_val", "fsig")
      .localCheckpoint()
    requireMixedHotBucket(vBands, Seq("band_idx", "band_val"), "embedding")
    def vecComp(cap: Int): Map[Long, Long] = {
      val cand = BucketGuard
        .candidatePairs(vBands, "vec_id", Seq("band_idx", "band_val"),
          "fsig", cap)
        .toDF("va", "vb")
      val verified = cand
        .join(vecs.select(col("vec_id").as("va"),
          col("embedding").as("ea")), Seq("va"))
        .join(vecs.select(col("vec_id").as("vb"),
          col("embedding").as("eb")), Seq("vb"))
        .filter(graft.functions.VectorFunctions
          .cosineDistance(col("ea"), col("eb")) <= EmbDupDistance)
        .select("va", "vb")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      unionFind(verified)
    }
    // The four guarded/unguarded sweeps are INDEPENDENT computations
    // over the two already-checkpointed corpora — running them
    // sequentially pays four full candidate+verify(+propagation) walls
    // back-to-back. Submit them concurrently (bounded pool, the
    // RecallReport discipline): per-sweep plans and component maps are
    // identical, Spark interleaves the tiny jobs.
    val sweeps: Seq[() => Map[Long, Long]] = Seq(
      () => compMap(Int.MaxValue), () => compMap(EvalCap),
      () => vecComp(Int.MaxValue), () => vecComp(EvalCap))
    val done = {
      import scala.collection.parallel.CollectionConverters._
      val p = sweeps.par
      p.tasksupport = new scala.collection.parallel.ForkJoinTaskSupport(
        new java.util.concurrent.ForkJoinPool(4))
      p.map(_()).toList
    }
    val Seq(mhTruth, mhGuarded, vTruth, vGuarded) = done
    val (mhPairs, mhIntact, mhComps) = componentMetrics(mhTruth, mhGuarded)
    val (embPairs, embIntact, embComps) = componentMetrics(vTruth, vGuarded)

    val measured = Map(
      "same_component_pairs" -> (mhPairs, mhComps),
      "components_intact" -> (mhIntact, mhComps),
      "emb_same_component_pairs" -> (embPairs, embComps),
      "emb_components_intact" -> (embIntact, embComps))
    val rows = measured.toSeq.sortBy(_._1).map { case (m, (r, nc)) =>
      if (!gate) System.err.println(f"[near-dup-recall] $m = $r%.3f")
      require(!gate || r >= Floors(m),
        f"recall gate: near-dup $m = $r%.3f under floor ${Floors(m)} " +
          s"(guarded cap=$EvalCap vs unguarded, $nc components)")
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
