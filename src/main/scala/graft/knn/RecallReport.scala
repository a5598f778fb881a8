package graft.knn

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.VectorFunctions._
import graft.index.Indexes
import graft.quant.{BinaryQuant, ProductQuant, ScalarQuant}

/** Recall@10 quality gate for every deterministic index family
  * (VERDICT r6 task #2). The reference publishes recall bands as its
  * quality bar (jcolano/fastpyvectordb README.md:504-508 — SQ 95-97%,
  * PQ 85-90%, BQ 80-85% recall@10; quantization.py:691-778 measures
  * them); the engine's prior gates only detected total collapse
  * (≥ 0.2/0.3). This report measures recall@10 against the exact
  * top-10 of each family's own metric, averaged over three
  * deterministic query vectors, and FAILS the entry (hence the
  * correctness gate) when a family drops under its floor — a
  * probe-parameter regression now turns a row red instead of sliding
  * through.
  *
  * Scale shape: each probe is the family's own top-k plan (scan-bound,
  * partition-prunable); the only driver-side state is the k-sized id
  * sets (≤ 10 ids per probe) — bounded by construction.
  */
object RecallReport {
  private val D = Tables.EmbeddingDim
  private val K = 10
  /** Deterministic query keys — averaging over three queries keeps the
    * gate stable against single-query luck without moving the floors. */
  private val Keys = Seq(7L, 11L, 13L)

  /** Per-family recall@10 floors for the DETERMINISTIC serving configs
    * (fixed hyperplanes/centroids/codebooks — the SQL-oracled twins).
    * The reference's published bands (SQ 95-97 / PQ 85-90 / BQ 80-85,
    * README.md:504-508) are for TRAINED quantizers on 128-dim
    * random-normal data; the deterministic twins on the 64-dim
    * hash-vector testdata measure lower by construction (fixed PQ
    * codebooks are untrained; 64-bit hamming has k-boundary tie
    * plateaus), so their floors sit just under the measured healthy
    * band measured across sf0.001/0.01/0.1 (lsh_multiprobe .93-1.0,
    * sq .83-.97, bq_rerank .73-.93, ivf_nprobe8 .63-.77, mips_nprobe8
    * .63-.77, pq_rerank .47-.77, lsh .33-.53, mips .43-.53,
    * ivf .37-.50, bq .17-.27, pq .13-.23) — any probe-param regression
    * still turns the entry red. Every family has a measured quality
    * knob: lsh→multiprobe, bq/pq→exact rescoring, ivf/mips→nprobe
    * widening. The trained paths carry the reference-band gate in
    * [[trainedReport]]. */
  val Floors: Map[String, Double] = Map(
    "sq" -> 0.75, "pq" -> 0.1, "bq" -> 0.1, "bq_rerank" -> 0.6,
    "pq_rerank" -> 0.4, "lsh" -> 0.25, "lsh_multiprobe" -> 0.75,
    "ivf" -> 0.3, "ivf_nprobe8" -> 0.5, "mips" -> 0.35,
    "mips_nprobe8" -> 0.5,
    // FILTERED serving (VERDICT r9 #8): exact-over-candidates, so the
    // failure mode is candidate STARVATION — a selective predicate
    // (label = 3, ~10% of rows) thins every probed bucket/cell to ~10%,
    // precisely what the reference's k×10 over-fetch heuristic existed
    // for (vectordb_optimized.py:507-575). Measured recall@10 vs the
    // exact FILTERED top-10 across sf0.001/0.01/0.1: lsh_filtered
    // .40-.43, ivf_filtered .27-.50, ivf_filtered_nprobe8 .60-.73,
    // ivfpq_filtered .27-.47 — floors
    // just under the cross-scale band, so probe-param regressions (or a
    // filter applied AFTER the top-k, which collapses recall to the
    // unfiltered-hit overlap) turn the entry red. The recovery knob for
    // the starved case is probe widening — the nprobe8 row must
    // dominate the nprobe4 one, the filtered analog of ivf→ivf_nprobe8.
    "lsh_filtered" -> 0.3, "ivf_filtered" -> 0.2,
    "ivfpq_filtered" -> 0.2, "ivf_filtered_nprobe8" -> 0.4)

  /** (family, hits over Keys, recall) — one row per family; throws if
    * any family is under its floor (set GRAFT_RECALL_GATE=off to
    * measure without gating, e.g. when tuning floors for new data). */
  def report(s: SparkSession, dir: String): DataFrame = {
    val gate = !sys.env.get("GRAFT_RECALL_GATE").contains("off")
    import s.implicits._
    // localCheckpoint: ~60 probe plans share the scan; the checkpoint is
    // query-local and GC-released (see Dedup.minhashLshPairs note)
    val emb = Tables.embeddings(s, dir).localCheckpoint()
    def ids(df: DataFrame, idCol: String = "vec_id"): Set[Long] =
      df.select(col(idCol).cast("long")).collect().map(_.getLong(0)).toSet

    // Every probe is an independent tiny top-k job with a k-row collect;
    // running 15 configs × 3 keys + 15 exact baselines SEQUENTIALLY pays
    // ~60 stage round-trips of wall (measured ~9-10 s at sf0.1). Submit
    // them CONCURRENTLY instead — Spark's scheduler interleaves the jobs
    // (the serving analog is concurrent queries), the per-probe plans
    // and id sets are bit-identical, and the pool is bounded so the
    // local scheduler isn't flooded. Indexes are ensured serially first:
    // ensure() is lock-guarded, and building under the pool would just
    // serialize the first wave on the build lock.
    val lshPath = Indexes.lshEmb(s, dir)
    val ivfPath = Indexes.ivfEmb(s, dir)
    val ivfPqPath = Indexes.ivfPqEmb(s, dir)
    import scala.collection.parallel.CollectionConverters._
    val pool = new scala.collection.parallel.ForkJoinTaskSupport(
      new java.util.concurrent.ForkJoinPool(6))
    def par[A](xs: Seq[A]): scala.collection.parallel.ParSeq[A] = {
      val p = xs.par; p.tasksupport = pool; p
    }

    val fpred = col("label") === 3
    // exact baselines, keyed (query key, metric, filtered): the filtered
    // truth is the exact top-K over the rows satisfying the predicate
    val exactCombos: Seq[(Long, String, Boolean)] = for {
      key <- Keys
      (m, f) <- Seq(("cosine", false), ("l2", false), ("ip", false),
        ("cosine", true), ("l2", true))
    } yield (key, m, f)
    val exact: Map[(Long, String, Boolean), Set[Long]] =
      par(exactCombos).map { case (key, m, f) =>
        val qv = hashVectorValues(key, D)
        val base = if (f) emb.filter(fpred) else emb
        (key, m, f) -> ids(Knn.search(base, col("embedding"),
          typedlit(qv), m, K, idCol = "vec_id"))
      }.toList.toMap

    // (family, key, probe thunk, exact-baseline key)
    val probes: Seq[(String, Long, () => Set[Long], (String, Boolean))] =
      Keys.flatMap { key =>
        val qv = hashVectorValues(key, D)
        def cos = (key, ("cosine", false))
        def l2 = (key, ("l2", false))
        def ip = (key, ("ip", false))
        def fcos = (key, ("cosine", true))
        def fl2 = (key, ("l2", true))
        Seq[(String, (Long, (String, Boolean)), () => Set[Long])](
          ("lsh", cos, () =>
            ids(Ann.lshSearch(emb, "embedding", "vec_id", qv, D, K))),
          // the recall knob: 1-bit-flip multi-probe (20/64 buckets
          // instead of 4) over the persistent index — must dominate lsh
          ("lsh_multiprobe", cos, () => ids(graft.index.LshIndex.search(s,
            lshPath, "embedding", "vec_id", qv, D, K, multiProbe = true))),
          ("ivf", cos, () => ids(Ann.ivfSearch(emb, "embedding", "vec_id",
            Ann.fixedIvfModel(Indexes.IvfCells, D), qv, nprobe = 4, K))),
          // IVF's recall loss is pure cell pruning (survivors rerank
          // exactly) — widening nprobe 4→8 is its quality knob
          ("ivf_nprobe8", cos, () => ids(Ann.ivfSearch(emb, "embedding",
            "vec_id", Ann.fixedIvfModel(Indexes.IvfCells, D), qv,
            nprobe = 8, K))),
          ("mips", ip, () => ids(Ann.mipsIvfSearch(emb, "embedding",
            "vec_id", cells = Indexes.IvfCells, qv, nprobe = 4, K))),
          ("mips_nprobe8", ip, () => ids(Ann.mipsIvfSearch(emb,
            "embedding", "vec_id", cells = Indexes.IvfCells, qv,
            nprobe = 8, K))),
          ("sq", cos, () => ids(ScalarQuant.searchCosine(emb, "embedding",
            "vec_id", qv, D, K))),
          ("bq", cos, () => ids(BinaryQuant.searchHamming(emb, "embedding",
            "vec_id", qv, D, K))),
          ("bq_rerank", cos, () => {
            val short = BinaryQuant.searchHamming(emb, "embedding",
              "vec_id", qv, D, K * 10).select("vec_id")
            ids(emb.join(short, "vec_id")
              .select(col("vec_id"),
                round(cosineDistance(col("embedding"), typedlit(qv)), 6)
                  .as("score"))
              .orderBy("score", "vec_id").limit(K))
          }),
          ("pq", l2, () => ids(ProductQuant.searchAdc(emb, "embedding",
            "vec_id", ProductQuant.fixedCodebooks(D, 8, 16), qv, K))),
          ("pq_rerank", l2, () => {
            val short = ProductQuant.searchAdc(emb, "embedding", "vec_id",
              ProductQuant.fixedCodebooks(D, 8, 16), qv, K * 10)
              .select("vec_id")
            ids(emb.join(short, "vec_id")
              .select(col("vec_id"),
                round(l2Distance(col("embedding"), typedlit(qv)), 6)
                  .as("score"))
              .orderBy("score", "vec_id").limit(K))
          }),
          ("lsh_filtered", fcos, () => ids(graft.index.LshIndex.search(s,
            lshPath, "embedding", "vec_id", qv, D, K,
            filter = Some(fpred)))),
          ("ivf_filtered", fcos, () => ids(graft.index.IvfIndex.search(s,
            ivfPath, "embedding", "vec_id", qv, nprobe = 4, K,
            filter = Some(fpred)))),
          ("ivf_filtered_nprobe8", fcos, () =>
            ids(graft.index.IvfIndex.search(s, ivfPath, "embedding",
              "vec_id", qv, nprobe = 8, K, filter = Some(fpred)))),
          ("ivfpq_filtered", fl2, () =>
            ids(graft.index.IvfPqIndex.search(s, ivfPqPath, "embedding",
              "vec_id", qv, nprobe = 4, K, filter = Some(fpred))))
        ).map { case (f, (k2, ex), thunk) => (f, k2, thunk, ex) }
      }
    val hits: Map[String, Int] =
      par(probes).map { case (f, key, thunk, ex) =>
        f -> thunk().intersect(exact((key, ex._1, ex._2))).size
      }.toList.groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2).sum }

    val denom = (Keys.size * K).toDouble
    val rows = hits.toSeq.sortBy(_._1).map { case (f, h) =>
      val recall = h / denom
      require(!gate || recall >= Floors(f),
        f"recall gate: $f recall@$K = $recall%.3f under floor ${Floors(f)} " +
          s"(hits=$h over ${Keys.size} queries)")
      (f, h.toLong, recall)
    }
    rows.toDF("family", "hits", "recall")
  }

  /** Floors for the TRAINED quantizer paths — the configs the
    * reference's published bands actually describe (PQ at 8x256
    * parity). Measured recall@10: ivf .53/.53/.67, pq .73/.70/.33,
    * ivfpq .57/.53/.63 at sf0.001/0.01/0.1 — hash-vector data is
    * near-uniform (no cluster structure), so trained quantizers sit
    * under the reference's random-normal-128-dim bands by
    * construction; floors take the cross-scale minimum minus margin so
    * the gate travels with the driver's scale choice. */
  val TrainedFloors: Map[String, Double] = Map(
    "ivf_trained" -> 0.45, "pq_trained" -> 0.25, "ivfpq_trained" -> 0.45,
    // filtered trained serving (r11, VERDICT r10 #6): measured recall@10
    // vs the exact FILTERED top-10 across sf0.001/0.01/0.1 —
    // ivf_trained_filtered .43/.37/.53, _nprobe8 .77/.67/.80 (widening
    // recovers starvation, same dominance as the fixed-grid rows),
    // ivfpq_trained_filtered .43/.37/.53; floors just under the
    // cross-scale band, and the nprobe8 floor sits ABOVE the nprobe4
    // band so a lost widening knob (or a filter applied after the
    // top-k) turns the entry red
    "ivf_trained_filtered" -> 0.25, "ivf_trained_filtered_nprobe8" -> 0.5,
    "ivfpq_trained_filtered" -> 0.25)

  /** Strict recall@10 for the trained IVF / PQ / IVF-PQ paths, averaged
    * over [[Keys]]; no SQL twin exists for k-means output, so the
    * entry emits (family, recall_ok) rows against a constant oracle and
    * the measured recall gates in-engine — the reference's own
    * discipline (quantization.py:691-778) with real floors instead of
    * collapse checks. */
  def trainedReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gate = !sys.env.get("GRAFT_RECALL_GATE").contains("off")
    val emb = Tables.embeddings(s, dir).localCheckpoint()
    def ids(df: DataFrame): Set[Long] =
      df.select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet

    val ivf = Ann.trainIvf(emb, "embedding", Indexes.IvfCells)
    // the reference's published PQ band is for PQ8x256
    // (quantization.py:744 — num_centroids=256); train at parity
    val cb = ProductQuant.train(emb, "embedding", D, m = 8, k = 256)
    val hits = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    for (key <- Keys) {
      val qv = hashVectorValues(key, D)
      val exCos = ids(Knn.search(emb, col("embedding"), typedlit(qv),
        "cosine", K, idCol = "vec_id"))
      val exL2 = ids(Knn.search(emb, col("embedding"), typedlit(qv),
        "l2", K, idCol = "vec_id"))
      hits("ivf_trained") += ids(Ann.ivfSearch(emb, "embedding", "vec_id",
        ivf, qv, nprobe = 4, K)).intersect(exCos).size
      hits("pq_trained") += ids(ProductQuant.searchAdc(emb, "embedding",
        "vec_id", cb, qv, K)).intersect(exL2).size
      // composed path: trained cells bound the scan, trained ADC bounds
      // the rerank pool, exact l2 decides — ann_ivfpq_trained's plan
      val probed = Ann.probeCells(ivf, qv, nprobe = 4)
      val vecD = col("embedding").cast("array<double>")
      val lutLit = typedlit(ProductQuant.adcLut(cb, qv).map(_.toSeq).toSeq)
      val pool = emb
        .filter(nearestCell(vecD, ivf.centroids).isin(probed: _*))
        .select(col("vec_id"), adcScore(pqEncode(vecD, cb.cb), lutLit).as("adc"))
        .orderBy(col("adc"), col("vec_id")).limit(50)
      val composed = emb.join(pool.select("vec_id"), "vec_id")
        .select(col("vec_id"),
          round(l2Distance(col("embedding"), typedlit(qv)), 6).as("score"))
        .orderBy("score", "vec_id").limit(K)
      hits("ivfpq_trained") += ids(composed).intersect(exL2).size
      // FILTERED trained serving (VERDICT r10 #6): the r10 filtered rows
      // gate the FIXED-codebook families only, and trained centroids
      // shift the starvation geometry (cells follow the data, so a ~10%-
      // selective predicate thins each probed cell differently than the
      // deterministic grid). Same exact-over-candidates composition as
      // the serving path — filter BEFORE scoring on the probed-cell
      // scan — measured against the exact FILTERED top-10, with the
      // nprobe-widening recovery row required to dominate (the trained
      // analog of ivf_filtered → ivf_filtered_nprobe8).
      val fpred = col("label") === 3
      val exCosF = ids(Knn.search(emb.filter(fpred), col("embedding"),
        typedlit(qv), "cosine", K, idCol = "vec_id"))
      val exL2F = ids(Knn.search(emb.filter(fpred), col("embedding"),
        typedlit(qv), "l2", K, idCol = "vec_id"))
      def ivfTrainedFiltered(np: Int): Set[Long] = {
        val pr = Ann.probeCells(ivf, qv, nprobe = np)
        ids(emb
          .filter(nearestCell(vecD, ivf.centroids).isin(pr: _*) && fpred)
          .select(col("vec_id"),
            round(cosineDistance(col("embedding"), typedlit(qv)), 6)
              .as("score"))
          .orderBy("score", "vec_id").limit(K))
      }
      hits("ivf_trained_filtered") +=
        ivfTrainedFiltered(4).intersect(exCosF).size
      hits("ivf_trained_filtered_nprobe8") +=
        ivfTrainedFiltered(8).intersect(exCosF).size
      val poolF = emb
        .filter(nearestCell(vecD, ivf.centroids).isin(probed: _*) && fpred)
        .select(col("vec_id"), adcScore(pqEncode(vecD, cb.cb), lutLit).as("adc"))
        .orderBy(col("adc"), col("vec_id")).limit(50)
      val composedF = emb.join(poolF.select("vec_id"), "vec_id")
        .select(col("vec_id"),
          round(l2Distance(col("embedding"), typedlit(qv)), 6).as("score"))
        .orderBy("score", "vec_id").limit(K)
      hits("ivfpq_trained_filtered") += ids(composedF).intersect(exL2F).size
    }
    val denom = (Keys.size * K).toDouble
    val rows = hits.toSeq.sortBy(_._1).map { case (f, h) =>
      val recall = h / denom
      if (!gate)
        System.err.println(f"[recall-trained] $f recall@$K = $recall%.3f")
      require(!gate || recall >= TrainedFloors(f),
        f"recall gate: $f recall@$K = $recall%.3f under floor " +
          s"${TrainedFloors(f)} (hits=$h over ${Keys.size} queries)")
      (f, recall >= TrainedFloors(f))
    }
    rows.toDF("family", "recall_ok")
  }

  def trainedReportSql: String =
    TrainedFloors.keys.toSeq.sorted
      .map(f => s"SELECT '$f' AS family, CAST(1 AS BOOLEAN) AS recall_ok")
      .mkString("\nUNION ALL\n") + "\nORDER BY family"

  /** DuckDB twin: the same hit counts from the families' existing SQL
    * oracles (each already hash-matched against its Spark entry, so the
    * id sets — and hence the intersection counts — agree exactly). */
  def reportSql: String = {
    def exactSql(metric: String, key: Long, where: String = ""): String =
      s"""SELECT vec_id FROM (
         |  SELECT vec_id,
         |         round(${Knn.distanceSql(metric, "embedding", "q.v", D)}, 6) AS score
         |  FROM embeddings, (SELECT ${hashVectorSql(key.toString, D)} AS v) q
         |  $where
         |  ORDER BY score, vec_id LIMIT $K)""".stripMargin
    def approxSql(family: String, key: Long): String = {
      val qv = hashVectorSql(key.toString, D)
      family match {
        case "lsh" => Ann.lshSearchSql("embeddings", "embedding", "vec_id", qv, D, K)
        case "lsh_multiprobe" => Ann.lshSearchSql("embeddings", "embedding",
          "vec_id", qv, D, K, multiProbe = true)
        case "ivf" => Ann.ivfSearchSql("embeddings", "embedding", "vec_id",
          qv, D, Indexes.IvfCells, nprobe = 4, K, floorRounding = true)
        case "ivf_nprobe8" => Ann.ivfSearchSql("embeddings", "embedding",
          "vec_id", qv, D, Indexes.IvfCells, nprobe = 8, K,
          floorRounding = true)
        case "mips" => Ann.mipsIvfSearchSql("embeddings", "embedding", "vec_id",
          qv, D, Indexes.IvfCells, nprobe = 4, K)
        case "mips_nprobe8" => Ann.mipsIvfSearchSql("embeddings", "embedding",
          "vec_id", qv, D, Indexes.IvfCells, nprobe = 8, K)
        case "sq" => ScalarQuant.searchCosineSql("embeddings", "embedding",
          "vec_id", qv, D, K)
        case "bq" => BinaryQuant.searchHammingSql("embeddings", "embedding",
          "vec_id", qv, D, K)
        case "bq_rerank" =>
          s"""WITH short AS (
             |  SELECT vec_id FROM (${BinaryQuant.searchHammingSql(
                  "embeddings", "embedding", "vec_id", qv, D, K * 10)})),
             |q AS (SELECT $qv AS v)
             |SELECT e.vec_id,
             |       round(${Knn.distanceSql("cosine", "e.embedding",
                  "q.v", D)}, 6) AS score
             |FROM embeddings e JOIN short USING (vec_id), q
             |ORDER BY score, vec_id LIMIT $K""".stripMargin
        case "pq" => ProductQuant.searchAdcSql("embeddings", "embedding",
          "vec_id", qv, D, 8, 16, K)
        case "pq_rerank" =>
          s"""WITH short AS (
             |  SELECT vec_id FROM (${ProductQuant.searchAdcSql(
                  "embeddings", "embedding", "vec_id", qv, D, 8, 16,
                  K * 10)})),
             |q AS (SELECT $qv AS v)
             |SELECT e.vec_id,
             |       round(${Knn.distanceSql("l2", "e.embedding",
                  "q.v", D)}, 6) AS score
             |FROM embeddings e JOIN short USING (vec_id), q
             |ORDER BY score, vec_id LIMIT $K""".stripMargin
        case "lsh_filtered" => Ann.lshSearchSql("embeddings", "embedding",
          "vec_id", qv, D, K, filterSql = Some("label = 3"))
        case "ivf_filtered" => Ann.ivfSearchSql("embeddings", "embedding",
          "vec_id", qv, D, Indexes.IvfCells, nprobe = 4, K,
          floorRounding = false, filterSql = Some("e.label = 3"))
        case "ivf_filtered_nprobe8" => Ann.ivfSearchSql("embeddings",
          "embedding", "vec_id", qv, D, Indexes.IvfCells, nprobe = 8, K,
          floorRounding = false, filterSql = Some("e.label = 3"))
        case "ivfpq_filtered" => graft.index.IvfPqIndex.searchSql(
          "embeddings", "embedding", "vec_id", qv, D, Indexes.IvfCells,
          m = 8, kCb = 16, nprobe = 4, k = K,
          filterSql = Some("e.label = 3"))
      }
    }
    val metricOf = Map("lsh" -> "cosine", "lsh_multiprobe" -> "cosine",
      "ivf" -> "cosine", "ivf_nprobe8" -> "cosine", "sq" -> "cosine",
      "bq" -> "cosine", "bq_rerank" -> "cosine",
      "mips" -> "ip", "mips_nprobe8" -> "ip",
      "pq" -> "l2", "pq_rerank" -> "l2",
      "lsh_filtered" -> "cosine", "ivf_filtered" -> "cosine",
      "ivf_filtered_nprobe8" -> "cosine", "ivfpq_filtered" -> "l2")
    val Filtered = Set("lsh_filtered", "ivf_filtered",
      "ivf_filtered_nprobe8", "ivfpq_filtered")
    val perKey = for {
      f <- Floors.keys.toSeq.sorted
      key <- Keys
    } yield
      s"""SELECT '$f' AS family,
         |  (SELECT count(*) FROM (${approxSql(f, key)}) a
         |   JOIN (${exactSql(metricOf(f), key,
               if (Filtered(f)) "WHERE label = 3" else "")}) e
         |   USING (vec_id)) AS h""".stripMargin
    s"""SELECT family, CAST(sum(h) AS BIGINT) AS hits,
       |       CAST(sum(h) AS DOUBLE) / ${Keys.size * K} AS recall
       |FROM (${perKey.mkString("\nUNION ALL\n")})
       |GROUP BY family ORDER BY family""".stripMargin
  }
}
