package graft.queries

import graft.Q
import graft.core.Tables
import graft.functions.VectorFunctions._
import graft.index.{Indexes, IndexStore, IvfIndex, LshIndex}
import graft.knn.Ann

/** ANN catalog queries: LSH and IVF, each in two forms — computed
  * in-query (the correctness kernel) and against the prebuilt persistent
  * index (the 100 TB shape: signatures/cells assigned once at build,
  * probes prune partitions). All four are DuckDB-oracled; the IVF paths
  * use the fixed deterministic codebook (Ann.fixedIvfModel — trained
  * k-means stays recall-gated in AnnSpec).
  */
object AnnQueries {
  private val D = Tables.EmbeddingDim
  private val K = 10

  /** One child session per (parent session uuid, sf dir) for the
    * sql_ann_topk_pq scoped serving path — see the entry's comment. */
  private val pqChildSessions = new java.util.concurrent.ConcurrentHashMap[
    (String, String), org.apache.spark.sql.SparkSession]()

  /** Oracle twin of the scratch collection's relation: the embeddings
    * table with a string id (collections key rows by a string id column).
    * Unaliased so oracle builders can attach their own alias (DuckDB
    * accepts an unaliased derived table where none is attached). */
  private val CollOracleRel =
    "(SELECT CAST(vec_id AS VARCHAR) AS id, embedding, label FROM embeddings)"

  val qs: Seq[Q] = Seq(
    Q(
      "ann_lsh_search",
      (s, dir) =>
        Ann.lshSearch(Tables.embeddings(s, dir), "embedding", "vec_id",
          hashVectorValues(11L, D), D, K),
      Some(Ann.lshSearchSql("embeddings", "embedding", "vec_id",
        hashVectorSql("11", D), D, K)),
      bench = true
    ),
    // same semantics, served from the persistent bucket table: build once,
    // probe 4 of 64 partitions per query (PartitionFilters)
    Q(
      "ann_lsh_indexed",
      (s, dir) =>
        LshIndex.search(s, Indexes.lshEmb(s, dir), "embedding", "vec_id",
          hashVectorValues(11L, D), D, K),
      Some(Ann.lshSearchSql("embeddings", "embedding", "vec_id",
        hashVectorSql("11", D), D, K)),
      bench = true
    ),
    // filtered ANN: the metadata predicate applies to bucket rows BEFORE
    // the rerank (exact filtered top-k) and pushes down to the index scan
    // alongside the partition probe — the reference's flagship
    // filter+search call (`vectordb_optimized.py:507-575`) without its
    // over-fetch heuristic
    Q(
      "ann_lsh_filtered",
      (s, dir) =>
        LshIndex.search(s, Indexes.lshEmb(s, dir), "embedding", "vec_id",
          hashVectorValues(11L, D), D, K,
          filter = Some(org.apache.spark.sql.functions.col("label") === 3)),
      Some(Ann.lshSearchSql("embeddings", "embedding", "vec_id",
        hashVectorSql("11", D), D, K, filterSql = Some("label = 3"))),
      bench = true
    ),
    // multi-probe: per band also probe every 1-bit-flip bucket (Lv et
    // al., VLDB'07) — 20 of 64 partitions instead of 4, strictly better
    // recall, still a partition filter
    Q(
      "ann_lsh_multiprobe",
      (s, dir) =>
        LshIndex.search(s, Indexes.lshEmb(s, dir), "embedding", "vec_id",
          hashVectorValues(11L, D), D, K, multiProbe = true),
      Some(Ann.lshSearchSql("embeddings", "embedding", "vec_id",
        hashVectorSql("11", D), D, K, multiProbe = true)),
      bench = true
    ),
    // batch form: the banded signature as a join key — one probe join for
    // a whole query batch (the cluster-scale shape)
    Q(
      "ann_lsh_batch",
      (s, dir) => {
        import s.implicits._
        val queries = Seq(11L, 12L, 13L).toDF("qid")
          .withColumn("qvec", hashVector(org.apache.spark.sql.functions.col("qid"), D))
        LshIndex.searchBatch(s, Indexes.lshEmb(s, dir), "embedding",
          "vec_id", queries, D, K)
      },
      Some(LshIndex.searchBatchSql("embeddings", "embedding", "vec_id",
        Seq(11L, 12L, 13L), D, K)),
      bench = true
    ),
    Q(
      "ann_ivf_search",
      (s, dir) =>
        Ann.ivfSearch(Tables.embeddings(s, dir), "embedding", "vec_id",
          Ann.fixedIvfModel(Indexes.IvfCells, D),
          hashVectorValues(11L, D), nprobe = 4, K),
      Some(Ann.ivfSearchSql("embeddings", "embedding", "vec_id",
        hashVectorSql("11", D), D, Indexes.IvfCells, nprobe = 4, K,
        floorRounding = true))
    ),
    // IVF batch over the partitioned layout: union of probe cells = one
    // literal partition filter for the whole batch, per-query membership
    // via a broadcast pair join
    Q(
      "ann_ivf_batch",
      (s, dir) => {
        val m = Ann.fixedIvfModel(Indexes.IvfCells, D)
        val queries = Seq(11L, 12L, 13L)
          .map(kk => kk -> hashVectorValues(kk, D))
        Ann.searchBatchPartitioned(s, s"${Indexes.ivfEmb(s, dir)}/cells",
          "embedding", "vec_id", m, queries, nprobe = 4, K)
      },
      Some(Ann.ivfSearchBatchSql("embeddings", "embedding", "vec_id",
        Seq(11L, 12L, 13L), D, Indexes.IvfCells, nprobe = 4, K)),
      bench = true
    ),
    // the durable form: corpus partitioned by cell at build time, probe
    // reads nprobe/cells of the files
    Q(
      "ann_ivf_partitioned",
      (s, dir) =>
        IvfIndex.search(s, Indexes.ivfEmb(s, dir), "embedding", "vec_id",
          hashVectorValues(11L, D), nprobe = 4, K),
      Some(Ann.ivfSearchSql("embeddings", "embedding", "vec_id",
        hashVectorSql("11", D), D, Indexes.IvfCells, nprobe = 4, K,
        floorRounding = false)),
      bench = true
    ),
    // filtered IVF: metadata predicate into the probed cell scan, exact
    // rerank after — the IVF twin of ann_lsh_filtered
    Q(
      "ann_ivf_filtered",
      (s, dir) =>
        IvfIndex.search(s, Indexes.ivfEmb(s, dir), "embedding", "vec_id",
          hashVectorValues(11L, D), nprobe = 4, K,
          filter = Some(org.apache.spark.sql.functions.col("label") === 3)),
      Some(Ann.ivfSearchSql("embeddings", "embedding", "vec_id",
        hashVectorSql("11", D), D, Indexes.IvfCells, nprobe = 4, K,
        floorRounding = false, filterSql = Some("e.label = 3"))),
      bench = true
    ),
    // cell-occupancy profile of the persistent IVF layout — the skew
    // diagnostic for a partitioned ANN corpus (a hot cell is a hot
    // partition is a slow probe); read straight off the index's
    // partition column, no vectors touched
    Q(
      "ann_ivf_cell_stats",
      (s, dir) =>
        s.read.parquet(s"${Indexes.ivfEmb(s, dir)}/cells")
          .groupBy("cell")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_vectors"))
          .orderBy("cell"),
      Some(Ann.ivfCellStatsSql("embeddings", "embedding", "vec_id", D,
        Indexes.IvfCells))
    ),
    // LSH bucket-occupancy histogram per band — the skew diagnostic of
    // the banded layout (a hot (band, sig) bucket = a hot candidate join
    // key at 100 TB); read straight off the persisted bucket table, no
    // vectors touched. The oracle recomputes every band signature.
    Q(
      "ann_lsh_bucket_stats",
      (s, dir) =>
        s.read.parquet(s"${Indexes.lshEmb(s, dir)}/buckets")
          .groupBy("band_idx", "band_val")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"))
          .groupBy("band_idx")
          .agg(
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n_buckets"),
            org.apache.spark.sql.functions.max("n").as("max_bucket"),
            org.apache.spark.sql.functions.sum("n").as("n_rows"))
          .orderBy("band_idx"),
      Some {
        val db = (0 until Ann.Bands).map(b =>
          s"${Ann.bandSql("embedding", b, D)} AS b$b")
        val bandRows = (0 until Ann.Bands).map(b =>
          s"SELECT vec_id, $b AS band_idx, b$b AS band_val FROM d")
          .mkString("\nUNION ALL\n")
        s"""WITH d AS (SELECT vec_id, ${db.mkString(", ")} FROM embeddings),
           |bands AS ($bandRows),
           |occ AS (
           |  SELECT band_idx, band_val, count(*) AS n
           |  FROM bands GROUP BY 1, 2)
           |SELECT band_idx, count(*) AS n_buckets,
           |       CAST(max(n) AS BIGINT) AS max_bucket,
           |       CAST(sum(n) AS BIGINT) AS n_rows
           |FROM occ GROUP BY band_idx ORDER BY band_idx""".stripMargin
      }
    ),
    // ip-metric ANN via the MIPS→L2 augmentation (Bachrach et al. 2014):
    // augmented-space IVF cells prune candidates, the TRUE dot product
    // reranks — the metric the reference serves only brute-force
    Q(
      "ann_ip_mips",
      (s, dir) =>
        Ann.mipsIvfSearch(Tables.embeddings(s, dir), "embedding", "vec_id",
          Indexes.IvfCells, hashVectorValues(11L, D), nprobe = 4, K),
      Some(Ann.mipsIvfSearchSql("embeddings", "embedding", "vec_id",
        hashVectorSql("11", D), D, Indexes.IvfCells, nprobe = 4, K)),
      bench = true
    ),
    // IVF-PQ, the composed billion-scale layout (Jégou et al. IVFADC):
    // partition-pruned probe, codes-only ADC candidate scan (column
    // pruning: m bytes/vector), exact-l2 rerank of a 50-row pool —
    // bit-exact oracle via the fixed IVF + PQ models
    Q(
      "ann_ivfpq_search",
      (s, dir) =>
        graft.index.IvfPqIndex.search(s, Indexes.ivfPqEmb(s, dir),
          "embedding", "vec_id", hashVectorValues(11L, D), nprobe = 4, K),
      Some(graft.index.IvfPqIndex.searchSql("embeddings", "embedding",
        "vec_id", hashVectorSql("11", D), D, Indexes.IvfCells, m = 8,
        kCb = 16, nprobe = 4, k = K)),
      bench = true
    ),
    // IVF-PQ batch: union of probe cells = one partition filter, ADC over
    // the codes column once for the whole batch, per-query pool + top-k
    // windows — the cluster-scale serving shape for query streams
    Q(
      "ann_ivfpq_batch",
      (s, dir) => {
        val queries = Seq(11L, 12L, 13L)
          .map(kk => kk -> hashVectorValues(kk, D))
        graft.index.IvfPqIndex.searchBatch(s, Indexes.ivfPqEmb(s, dir),
          "embedding", "vec_id", queries, nprobe = 4, K)
      },
      Some(graft.index.IvfPqIndex.searchBatchSql("embeddings", "embedding",
        "vec_id", Seq(11L, 12L, 13L), D, Indexes.IvfCells, m = 8,
        kCb = 16, nprobe = 4, k = K)),
      bench = true
    ),
    // filtered IVF-PQ: the metadata predicate reaches BOTH pruned scans
    // (ADC candidates and rerank), so the pool is filtered before ranking
    Q(
      "ann_ivfpq_filtered",
      (s, dir) =>
        graft.index.IvfPqIndex.search(s, Indexes.ivfPqEmb(s, dir),
          "embedding", "vec_id", hashVectorValues(11L, D), nprobe = 4, K,
          filter = Some(org.apache.spark.sql.functions.col("label") === 3)),
      Some(graft.index.IvfPqIndex.searchSql("embeddings", "embedding",
        "vec_id", hashVectorSql("11", D), D, Indexes.IvfCells, m = 8,
        kCb = 16, nprobe = 4, k = K, filterSql = Some("e.label = 3")))
    ),
    // the declarative surface: a plain ORDER BY cosine-distance LIMIT k
    // over a REGISTERED table — the AnnTopKRewrite optimizer rule swaps
    // the full scan for the LSH index probe (plan-verified in
    // AnnTopKSpec); same oracle as the programmatic probe queries.
    // Registration is a session-scoped opt-in and stays armed after this
    // query (by design — it declares "ANN top-k is acceptable for this
    // table"); it cannot capture the other catalog queries, which all
    // sort on a projected score attribute, never on an inline distance
    // expression (pinned by AnnTopKSpec's isolation test).
    Q(
      "sql_ann_topk",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, round, typedlit}
        graft.plans.AnnTopK.install(s)
        graft.plans.IndexedTables.register(s, s"$dir/embeddings.parquet",
          "embedding", "vec_id", D, Indexes.lshEmb(s, dir))
        val qc = typedlit(hashVectorValues(11L, D))
        Tables.embeddings(s, dir)
          .orderBy(round(cosineDistance(col("embedding"), qc), 6),
            col("vec_id"))
          .limit(K)
          .select(col("vec_id"),
            round(cosineDistance(col("embedding"), qc), 6).as("score"))
          .orderBy("score", "vec_id")
      },
      Some(Ann.lshSearchSql("embeddings", "embedding", "vec_id",
        hashVectorSql("11", D), D, K)),
      bench = true
    ),
    // the FILTERED declarative surface: WHERE meta = x ORDER BY distance
    // LIMIT k over the registered table — the rewrite matches the Filter
    // between sort and scan and pushes the predicate INTO the bucket
    // probe (filter BEFORE rerank = exact filtered top-k, the same
    // semantics as the programmatic LshIndex.search(filter=...)); plan
    // pinned in AnnTopKSpec
    Q(
      "sql_ann_topk_filtered",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, round, typedlit}
        graft.plans.AnnTopK.install(s)
        graft.plans.IndexedTables.register(s, s"$dir/embeddings.parquet",
          "embedding", "vec_id", D, Indexes.lshEmb(s, dir))
        val qc = typedlit(hashVectorValues(11L, D))
        Tables.embeddings(s, dir)
          .filter(col("label") === 3)
          .orderBy(round(cosineDistance(col("embedding"), qc), 6),
            col("vec_id"))
          .limit(K)
          .select(col("vec_id"),
            round(cosineDistance(col("embedding"), qc), 6).as("score"))
          .orderBy("score", "vec_id")
      },
      Some(Ann.lshSearchSql("embeddings", "embedding", "vec_id",
        hashVectorSql("11", D), D, K, filterSql = Some("label = 3"))),
      bench = true
    ),
    // the l2 face of the declarative surface: ORDER BY l2-distance LIMIT
    // k over a table registered with its IVF index ⇒ the optimizer swaps
    // the full scan for the nprobe-cell partition probe; sort/limit stay
    // and rerank exactly (each id lives in one cell — no dedup needed)
    Q(
      "sql_ann_topk_l2",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, round, typedlit}
        graft.plans.AnnTopK.install(s)
        graft.plans.IndexedTables.registerIvf(s, s"$dir/embeddings.parquet",
          "embedding", "vec_id", D, Indexes.ivfEmb(s, dir),
          Ann.fixedIvfModel(Indexes.IvfCells, D))
        val qc = typedlit(hashVectorValues(11L, D))
        Tables.embeddings(s, dir)
          .orderBy(round(l2Distance(col("embedding"), qc), 6),
            col("vec_id"))
          .limit(K)
          .select(col("vec_id"),
            round(l2Distance(col("embedding"), qc), 6).as("score"))
          .orderBy("score", "vec_id")
      },
      Some(Ann.ivfSearchSql("embeddings", "embedding", "vec_id",
        hashVectorSql("11", D), D, Indexes.IvfCells, nprobe = 4, K,
        floorRounding = false, metric = "l2")),
      bench = true
    ),
    // the billion-scale face: the same l2 ORDER BY ... LIMIT k over an
    // IVF-PQ-registered table ⇒ partition-pruned probe + codegen'd ADC
    // pool bound over the stored codes + exact rerank by the query's own
    // sort/limit (the SQL surface reaching the IVFADC layout)
    Q(
      "sql_ann_topk_pq",
      (s0, dir) => {
        import org.apache.spark.sql.functions.{col, round, typedlit}
        // this entry pins the IVF-PQ serving of an l2 sort; the exact
        // IVF registration (armed by sql_ann_topk_l2 on the same
        // session) would win the kind-scoped lookup. Scope the serving
        // choice with a CHILD session (shared SparkContext, isolated
        // session state — registrations are keyed by session UUID):
        // only the IVF-PQ entry exists in the child, so every planning
        // of this DataFrame — including the fresh QueryExecutions that
        // downstream write/coalesce derive — resolves to the IVFADC
        // probe, the parent session's registry is never touched, and
        // the result stays a LAZY plan (the former unregister/execute/
        // reinstate dance and its k-row collect-and-reparallelize
        // pinning are gone; catalog entries are order-independent —
        // SqlAnnOrderSpec runs the family shuffled). The child is
        // MEMOIZED per (parent session, dir): repeated invocations —
        // bench reps, a long-lived serving session replanning the entry
        // — reuse one child and its one registry entry (re-registering
        // overwrites the same (uuid, path, kind) key) instead of
        // leaking a session UUID + Reg per call.
        val s = pqChildSessions.computeIfAbsent(
          (org.apache.spark.sql.graft.bridge.sessionUuid(s0), dir),
          _ => s0.newSession())
        graft.plans.AnnTopK.install(s)
        graft.plans.IndexedTables.registerIvfPq(s,
          s"$dir/embeddings.parquet", "embedding", "vec_id", D,
          Indexes.ivfPqEmb(s, dir), Ann.fixedIvfModel(Indexes.IvfCells, D),
          graft.quant.ProductQuant.fixedCodebooks(D, 8, 16))
        val qc = typedlit(hashVectorValues(11L, D))
        Tables.embeddings(s, dir)
          .orderBy(round(l2Distance(col("embedding"), qc), 6),
            col("vec_id"))
          .limit(K)
          .select(col("vec_id"),
            round(l2Distance(col("embedding"), qc), 6).as("score"))
          .orderBy("score", "vec_id")
      },
      Some(graft.index.IvfPqIndex.searchSql("embeddings", "embedding",
        "vec_id", hashVectorSql("11", D), D, Indexes.IvfCells, m = 8,
        kCb = 16, nprobe = 4, K, metric = "l2")),
      bench = true
    ),
    // the ip face of the declarative surface: ORDER BY ip-distance
    // (−dot) LIMIT k over a MIPS-registered table ⇒ augmented-cell
    // partition probe; sort/limit stay and rerank by the true dot
    Q(
      "sql_ann_topk_ip",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, round, typedlit}
        graft.plans.AnnTopK.install(s)
        graft.plans.IndexedTables.registerMips(s, s"$dir/embeddings.parquet",
          "embedding", "vec_id", D, Indexes.mipsEmb(s, dir),
          cells = Indexes.IvfCells)
        val qc = typedlit(hashVectorValues(11L, D))
        Tables.embeddings(s, dir)
          .orderBy(round(ipDistance(col("embedding"), qc), 6),
            col("vec_id"))
          .limit(K)
          .select(col("vec_id"),
            round(ipDistance(col("embedding"), qc), 6).as("score"))
          .orderBy("score", "vec_id")
      },
      Some(Ann.mipsIvfSearchSql("embeddings", "embedding", "vec_id",
        hashVectorSql("11", D), D, Indexes.IvfCells, nprobe = 4, K,
        floorRounding = false)),
      bench = true
    ),
    // trained-quantizer scale paths as SELF-VERIFYING recall gates:
    // k-means output has no SQL oracle, so each entry runs the trained
    // probe end-to-end, computes its recall in-engine against the exact
    // top-k (the reference's own discipline — recall-vs-ground-truth,
    // `quantization.py:691-703, 727-778`), and emits ONE boolean row the
    // constant oracle pins. A recall regression turns the row red instead
    // of sliding through a rows-only check.
    Q(
      "ann_ivf_trained",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, count, lit, typedlit}
        val e = Tables.embeddings(s, dir)
        val m = Ann.trainIvf(e, "embedding", Indexes.IvfCells)
        val qv = hashVectorValues(11L, D)
        val approx = Ann.ivfSearch(e, "embedding", "vec_id", m, qv,
          nprobe = 4, K).select("vec_id")
        val exact = graft.knn.Knn.search(e, col("embedding"), typedlit(qv),
          "cosine", K).select("vec_id")
        // nprobe=4 of 16 trained cells; threshold leaves headroom under
        // the recall measured at sf0.001/0.01/0.1 (see AnnSpec's gate)
        approx.join(exact, "vec_id")
          .agg((count(lit(1)) >= math.ceil(K * 0.3).toLong).as("recall_ok"))
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS recall_ok")
    ),
    // the composed billion-scale path with BOTH models trained: trained
    // coarse cells gate the scan, trained PQ codebooks drive the ADC
    // pool bound, exact l2 reranks — recall gated like the components
    Q(
      "ann_ivfpq_trained",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, count, lit, round, typedlit}
        val e = Tables.embeddings(s, dir)
        val ivf = Ann.trainIvf(e, "embedding", Indexes.IvfCells)
        // same corpus-adaptive capacity as pq_trained (r13): the ADC
        // pool's quality decays with density at fixed k even though the
        // exact rerank blunts it — scale the codebook, not the floor
        val cb = graft.quant.ProductQuant.train(e, "embedding", D, m = 8,
          k = graft.quant.ProductQuant.adaptiveK(e.count()))
        val qv = hashVectorValues(11L, D)
        val probed = Ann.probeCells(ivf, qv, nprobe = 4)
        val vecD = col("embedding").cast("array<double>")
        val lutLit = typedlit(
          graft.quant.ProductQuant.adcLut(cb, qv).map(_.toSeq).toSeq)
        val pool = e
          .filter(nearestCell(vecD, ivf.centroids).isin(probed: _*))
          .select(col("vec_id"),
            adcScore(pqEncode(vecD, cb.cb), lutLit).as("adc"))
          .orderBy(col("adc"), col("vec_id"))
          .limit(50)
        val approx = e.join(pool.select("vec_id"), "vec_id")
          .select(col("vec_id"),
            round(l2Distance(col("embedding"), typedlit(qv)), 6).as("score"))
          .orderBy("score", "vec_id")
          .limit(K)
          .select("vec_id")
        val exact = graft.knn.Knn.search(e, col("embedding"), typedlit(qv),
          "l2", K * 5).select("vec_id")
        approx.join(exact, "vec_id")
          .agg((count(lit(1)) >= math.ceil(K * 0.3).toLong).as("recall_ok"))
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS recall_ok")
    ),
    Q(
      "pq_trained",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, count, lit, typedlit}
        val e = Tables.embeddings(s, dir)
        // capacity scales with the corpus (r13): a fixed k=16 codebook
        // decays below the recall floor as the cloud densifies — the
        // first rotating 30x certification draw caught exactly that
        // (2/10 vs floor 3; adaptiveK's 256 measures 7/10 there)
        val cb = graft.quant.ProductQuant.train(e, "embedding", D, m = 8,
          k = graft.quant.ProductQuant.adaptiveK(e.count()))
        val qv = hashVectorValues(11L, D)
        val approx = graft.quant.ProductQuant.searchAdc(e, "embedding",
          "vec_id", cb, qv, K).select("vec_id")
        // ADC ranks by quantized distance, so compare against a wider
        // exact pool (top-5K), QuantSpec's discipline for PQ; measured
        // overlap 0.4-1.0 across sf0.001/0.01/0.1, gate leaves margin
        val exact = graft.knn.Knn.search(e, col("embedding"), typedlit(qv),
          "l2", K * 5).select("vec_id")
        approx.join(exact, "vec_id")
          .agg((count(lit(1)) >= math.ceil(K * 0.3).toLong).as("recall_ok"))
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS recall_ok")
    ),
    // the collection-integrated path: a VectorCollection owning its data
    // AND its index — searchAnn ensures/probes an LSH index over the
    // collection's own vectors, fingerprint-invalidated by every commit.
    // The scratch collection is keyed by the SOURCE fingerprint so a
    // regenerated testdata dir can never serve a stale collection.
    Q(
      "collection_ann_search",
      (s, dir) => collectionAnn(s, dir).searchAnn(hashVectorValues(11L, D), K),
      Some(Ann.lshSearchSql(CollOracleRel, "embedding", "id",
        hashVectorSql("11", D), D, K))
    ),
    // filter + ANN together over the collection (metadata filter pushed
    // into the index bucket scan, exact rerank after)
    Q(
      "collection_ann_filtered",
      (s, dir) => collectionAnn(s, dir).searchAnn(hashVectorValues(11L, D), K,
        filter = Some(graft.filter.Eq("label", 3))),
      Some(Ann.lshSearchSql(CollOracleRel, "embedding", "id",
        hashVectorSql("11", D), D, K, filterSql = Some("label = 3")))
    ),
    // batch ANN over the collection's own index: one probe join serves
    // the whole query relation
    Q(
      "collection_ann_batch",
      (s, dir) => {
        import s.implicits._
        val queries = Seq(11L, 12L, 13L).toDF("qid")
          .withColumn("qvec", hashVector(org.apache.spark.sql.functions.col("qid"), D))
        collectionAnn(s, dir).searchAnnBatch(queries, K)
      },
      Some(LshIndex.searchBatchSql(CollOracleRel, "embedding", "id",
        Seq(11L, 12L, 13L), D, K))
    ),
    // an l2 collection carries an IVF cell index instead of LSH buckets
    // (the index family follows the metric) — probe nprobe/cells
    // partitions, rerank with the TRUE l2 distance, index maintained
    // across mutations exactly like the cosine path
    Q(
      "collection_ann_l2",
      (s, dir) => collectionAnnL2(s, dir).searchAnn(hashVectorValues(11L, D), K),
      Some(Ann.ivfSearchSql(CollOracleRel, "embedding", "id",
        hashVectorSql("11", D), D, Indexes.IvfCells, nprobe = 4, K,
        floorRounding = false, metric = "l2"))
    ),
    Q(
      "collection_ann_l2_filtered",
      (s, dir) => collectionAnnL2(s, dir).searchAnn(hashVectorValues(11L, D), K,
        filter = Some(graft.filter.Eq("label", 3))),
      Some(Ann.ivfSearchSql(CollOracleRel, "embedding", "id",
        hashVectorSql("11", D), D, Indexes.IvfCells, nprobe = 4, K,
        floorRounding = false, filterSql = Some("label = 3"), metric = "l2"))
    ),
    // an ip collection carries the MIPS augmented-cell layout — probe
    // nprobe/cells partitions in the augmented space, rerank with the
    // TRUE dot product, index maintained across mutations like the
    // other metric families
    Q(
      "collection_ann_ip",
      (s, dir) => collectionAnnIp(s, dir).searchAnn(hashVectorValues(11L, D), K),
      Some(Ann.mipsIvfSearchSql(CollOracleRel, "embedding", "id",
        hashVectorSql("11", D), D, Indexes.IvfCells, nprobe = 4, K,
        floorRounding = false))
    ),
    Q(
      "collection_ann_ip_filtered",
      (s, dir) => collectionAnnIp(s, dir).searchAnn(hashVectorValues(11L, D), K,
        filter = Some(graft.filter.Eq("label", 3))),
      Some(Ann.mipsIvfSearchSql(CollOracleRel, "embedding", "id",
        hashVectorSql("11", D), D, Indexes.IvfCells, nprobe = 4, K,
        floorRounding = false, filterSql = Some("e.label = 3")))
    ),
    // distributed ip batch: the MIPS twin of the l2 batch below — probe
    // cells from a queries×broadcast(augmented centroids) window, true
    // dot product reranks
    Q(
      "collection_ann_ip_batch",
      (s, dir) => {
        import s.implicits._
        val queries = Seq(11L, 12L, 13L).toDF("qid")
          .withColumn("qvec", hashVector(org.apache.spark.sql.functions.col("qid"), D))
        collectionAnnIp(s, dir).searchAnnBatch(queries, K)
      },
      Some(Ann.mipsIvfSearchBatchSql(CollOracleRel, "embedding", "id",
        Seq(11L, 12L, 13L), D, Indexes.IvfCells, nprobe = 4, K))
    ),
    // distributed l2 batch: the (qid, qvec) relation never reaches the
    // driver — probe cells come from a queries×broadcast(centroids)
    // window, and dynamic partition pruning skips unprobed cell files
    Q(
      "collection_ann_l2_batch",
      (s, dir) => {
        import s.implicits._
        val queries = Seq(11L, 12L, 13L).toDF("qid")
          .withColumn("qvec", hashVector(org.apache.spark.sql.functions.col("qid"), D))
        collectionAnnL2(s, dir).searchAnnBatch(queries, K)
      },
      Some(Ann.ivfSearchBatchSql(CollOracleRel, "embedding", "id",
        Seq(11L, 12L, 13L), D, Indexes.IvfCells, nprobe = 4, K,
        metric = "l2"))
    ),
    // recall@10 quality gate across all six deterministic index
    // families, vs each family's own exact top-k, averaged over three
    // query vectors; the run THROWS if any family is under its floor
    // (RecallReport.Floors) — the reference's published recall bands
    // (README.md:504-508) as a load-bearing gate, not a collapse check
    Q(
      "ann_recall_report",
      (s, dir) => graft.knn.RecallReport.report(s, dir),
      Some(graft.knn.RecallReport.reportSql)
    ),
    // the trained-quantizer twin: strict recall@10 for trained
    // IVF/PQ/IVF-PQ with real floors (k-means has no SQL oracle, so
    // the rows are boolean gates pinned by a constant oracle)
    Q(
      "ann_recall_trained",
      (s, dir) => graft.knn.RecallReport.trainedReport(s, dir),
      Some(graft.knn.RecallReport.trainedReportSql)
    )
  )

  /** Scratch VectorCollection mirroring the embeddings table, created
    * under the (versioned) index root and keyed by the source fingerprint
    * — idempotent across runs, auto-fresh across testdata regens. */
  private def collectionAnn(s: org.apache.spark.sql.SparkSession,
      dir: String): graft.core.VectorCollection =
    scratchCollection(s, dir, "emb", "cosine")

  private def collectionAnnL2(s: org.apache.spark.sql.SparkSession,
      dir: String): graft.core.VectorCollection =
    scratchCollection(s, dir, "emb_l2", "l2")

  private def collectionAnnIp(s: org.apache.spark.sql.SparkSession,
      dir: String): graft.core.VectorCollection =
    scratchCollection(s, dir, "emb_ip", "ip")

  private def scratchCollection(s: org.apache.spark.sql.SparkSession,
      dir: String, name: String, metric: String): graft.core.VectorCollection = {
    import org.apache.spark.sql.functions.col
    val fp = IndexStore.fingerprint(s, Seq(s"$dir/embeddings.parquet"))
    // Prune stale-fingerprint siblings of this scratch collection —
    // mirrors IndexStore.ensure's stale-sibling removal, which doesn't
    // apply here (collections live under _collections, not an index
    // kind dir). Without this, every testdata regen leaks a full
    // collection + its indexes into the tmp root forever.
    val collRoot = new org.apache.hadoop.fs.Path(
      s"${IndexStore.root}/_collections")
    val fsys = collRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
    val prefix = s"${IndexStore.slug(dir)}_"
    if (fsys.exists(collRoot))
      fsys.listStatus(collRoot).foreach { st =>
        val n = st.getPath.getName
        // only dirs whose suffix is a bare fingerprint (hex, no '_') —
        // another dataset whose slug merely starts with this slug must
        // not be swept up
        val suffix = n.stripPrefix(prefix)
        if (n.startsWith(prefix) && suffix != fp &&
            suffix.matches("[0-9a-f]+"))
          fsys.delete(st.getPath, true)
      }
    val vdb = new graft.core.VectorDb(s,
      s"${IndexStore.root}/_collections/${IndexStore.slug(dir)}_$fp")
    val coll = vdb.getOrCreateCollection(name, D, metric)
    if (coll.isEmpty)
      coll.insertBatch(Tables.embeddings(s, dir).select(
        col("vec_id").cast("string").as("id"),
        col("embedding").as("vector"),
        col("label")))
    coll
  }
}
