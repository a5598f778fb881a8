package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.functions.VectorFunctions._
import graft.knn.Knn

/** Exact kNN over the `embeddings` testdata table, all three reference
  * metrics (`vectordb_optimized.py:49-53`), plus filtered and batch
  * variants. Query vectors are deterministic hash-vectors (keys 1..3) so
  * the DuckDB oracle reproduces them exactly.
  */
object KnnQueries {
  private val D = Tables.EmbeddingDim
  private val K = 10

  private def qvecSql(key: Int): String = hashVectorSql(key.toString, D)

  private def knnQ(name: String, metric: String, key: Int): Q = Q(
    name,
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Knn.search(e, col("embedding"), hashVectorLit(key, D), metric, K)
        .select("vec_id", "label", "score")
    },
    Some(
      s"""WITH q AS (SELECT ${qvecSql(key)} AS v)
         |SELECT vec_id, label,
         |       round(${Knn.distanceSql(metric, "embedding", "q.v", D)}, 6) AS score
         |FROM embeddings, q
         |ORDER BY score, vec_id LIMIT $K""".stripMargin),
    bench = true
  )

  val qs: Seq[Q] = Seq(
    // kNN self-join: every vector gets its top-3 LSH-candidate neighbors —
    // the all-rows batch form of ANN search, the shape a pipeline uses to
    // attach neighbors to every training example. Scale-safe: candidates
    // come from the hyperplane-LSH (band_idx, band_val) bucket equi-join
    // (the same signature family as the persistent index), exact cosine +
    // per-vector top-3 window only on collisions — no label-blocked
    // all-pairs join anywhere in the plan.
    Q(
      "knn_self_join",
      (s, dir) => {
        // vectors stored ONCE (localCheckpoint); the bucket self-join
        // carries only (vec_id, band) scalars, and the arrays re-enter
        // the plan through the two scoring joins on the distinct
        // candidate pairs — at corpus scale the candidate shuffle is the
        // expensive one, and it must never carry Bands copies of the
        // vector (same layout as Dedup.docSignatures/bandRows)
        val emb = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding")).localCheckpoint()
        val bands = graft.index.LshIndex
          .bucketRows(emb, "embedding", "vec_id", D, withFullSig = true)
          .select("vec_id", "band_idx", "band_val", "fsig")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id"))
          .orderBy(col("dist"), col("nbr_id"))
        // ordered pairs (a < b) halve the join output and the cosine
        // evaluations; the symmetric (b, a) rows are mirrored AFTER
        // scoring, where each pair is one scalar row. BucketGuard thins
        // any bucket above its cap to O(n) candidates (hot-bucket guard)
        val cand = graft.dedup.BucketGuard
          .candidatePairs(bands, "vec_id", Seq("band_idx", "band_val"), "fsig")
          .toDF("va", "vb")
        val pairs = cand
          .join(emb.select(col("vec_id").as("va"), col("embedding").as("ea")),
            Seq("va"))
          .join(emb.select(col("vec_id").as("vb"), col("embedding").as("eb")),
            Seq("vb"))
          .select(col("va"), col("vb"),
            round(cosineDistance(col("ea"), col("eb")), 6).as("dist"))
        // mirror via explode, NOT a self-union (r17): `pairs` is the
        // candidate joins + the cosine kernel, and Spark does not share
        // common subtrees across union branches — the union form
        // executed the scoring joins and every cosine TWICE per action
        // (same rows, plan audit: 2× BroadcastHashJoin chains → 1).
        // explode emits both directions from one scored row.
        pairs
          .select(explode(array(
            struct(col("va").as("vec_id"), col("vb").as("nbr_id"),
              col("dist")),
            struct(col("vb").as("vec_id"), col("va").as("nbr_id"),
              col("dist")))).as("p"))
          .select(col("p.vec_id").as("vec_id"), col("p.nbr_id").as("nbr_id"),
            col("p.dist").as("dist"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select("vec_id", "nbr_id", "rank", "dist")
          .orderBy("vec_id", "rank")
      },
      Some {
        import graft.knn.Ann
        val db = (0 until Ann.Bands).map(b =>
          s"${Ann.bandSql("embedding", b, D)} AS b$b")
        val bandRows = (0 until Ann.Bands).map(b =>
          s"SELECT vec_id, $b AS band_idx, b$b AS band_val FROM d")
          .mkString("\nUNION ALL\n")
        s"""WITH d AS (SELECT vec_id, ${db.mkString(", ")} FROM embeddings),
           |bands AS ($bandRows),
           |cand AS (
           |  SELECT DISTINCT a.vec_id, b.vec_id AS nbr_id
           |  FROM bands a JOIN bands b
           |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
           |   AND a.vec_id <> b.vec_id),
           |pairs AS (
           |  SELECT c.vec_id, c.nbr_id,
           |         round(${cosineDistanceSql("ea.embedding", "eb.embedding", D)}, 6) AS dist
           |  FROM cand c
           |  JOIN embeddings ea ON ea.vec_id = c.vec_id
           |  JOIN embeddings eb ON eb.vec_id = c.nbr_id),
           |ranked AS (
           |  SELECT vec_id, nbr_id, dist,
           |         row_number() OVER (PARTITION BY vec_id
           |                            ORDER BY dist, nbr_id) AS rank
           |  FROM pairs)
           |SELECT vec_id, nbr_id, rank, dist FROM ranked
           |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin
      },
      bench = true
    ),
    knnQ("knn_cosine", "cosine", 1),
    knnQ("knn_l2", "l2", 2),
    knnQ("knn_ip", "ip", 3),
    // pre-filter (exact filtered top-k; reference over-fetches + post-filters,
    // grouped top-k (faceted search): the 3 nearest neighbors WITHIN
    // EVERY label for one query, in a single pass — score, then one
    // rank window partitioned on the group key (the knn_batch shape
    // with the corpus-side label as the partition). One shuffle on
    // label, no per-group job fan-out.
    Q(
      "knn_grouped_topk",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("label")
          .orderBy(col("score"), col("vec_id"))
        Tables.embeddings(s, dir)
          .select(col("vec_id"), col("label"),
            round(cosineDistance(col("embedding"), hashVectorLit(1, D)), 6)
              .as("score"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select("label", "rk", "vec_id", "score")
          .orderBy("label", "rk")
      },
      Some(
        s"""WITH q AS (SELECT ${qvecSql(1)} AS v),
           |sc AS (
           |  SELECT vec_id, label,
           |         round(${Knn.distanceSql("cosine", "embedding", "q.v", D)}, 6)
           |           AS score
           |  FROM embeddings, q),
           |rk AS (
           |  SELECT label, vec_id, score,
           |         row_number() OVER (PARTITION BY label
           |                            ORDER BY score, vec_id) AS rk
           |  FROM sc)
           |SELECT label, CAST(rk AS INT) AS rk, vec_id, score
           |FROM rk WHERE rk <= 3 ORDER BY label, rk""".stripMargin)
    ),
    // which can under-fill — SURVEY.md §4)
    Q(
      "knn_filtered",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Knn.search(e, col("embedding"), hashVectorLit(1, D), "cosine", K,
            filter = Some(col("label") < 5))
          .select("vec_id", "label", "score")
      },
      Some(
        s"""WITH q AS (SELECT ${qvecSql(1)} AS v)
           |SELECT vec_id, label,
           |       round(${Knn.distanceSql("cosine", "embedding", "q.v", D)}, 6) AS score
           |FROM embeddings, q
           |WHERE label < 5
           |ORDER BY score, vec_id LIMIT $K""".stripMargin)
    ),
    // include_vectors projection (reference include_vector flag,
    // vectordb_optimized.py:425-465): return vector-derived columns with
    // the hits (norm here — arrays don't hash portably in the oracle)
    Q(
      "knn_with_vectors",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Knn.search(e, col("embedding"), hashVectorLit(1, D), "cosine", K)
          .withColumn("vec_norm",
            round(sqrt(vecDot(col("embedding"), col("embedding"))), 6))
          .select("vec_id", "label", "score", "vec_norm")
      },
      Some(
        s"""WITH q AS (SELECT ${qvecSql(1)} AS v)
           |SELECT vec_id, label,
           |       round(${Knn.distanceSql("cosine", "embedding", "q.v", D)}, 6) AS score,
           |       round(${normSql("embedding", D)}, 6) AS vec_norm
           |FROM embeddings, q
           |ORDER BY score, vec_id LIMIT $K""".stripMargin)
    ),
    // batch: 3 broadcast query vectors, per-query top-k via ranking window
    // (reference batch GEMM search, parallel_search.py:246-311)
    Q(
      "knn_batch",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val queries = s.range(1, 4).toDF("query_id")
          .withColumn("qvec", hashVector(col("query_id"), D))
        Knn.searchBatch(e, col("embedding"), queries, "cosine", K)
          .select("query_id", "vec_id", "label", "score")
          .orderBy("query_id", "score", "vec_id")
      },
      Some(
        s"""WITH q AS (
           |  SELECT qid AS query_id, ${hashVectorSql("qid", D)} AS v
           |  FROM (VALUES (1), (2), (3)) t(qid)),
           |scored AS (
           |  SELECT q.query_id, e.vec_id, e.label,
           |         round(${Knn.distanceSql("cosine", "e.embedding", "q.v", D)}, 6) AS score
           |  FROM embeddings e CROSS JOIN q)
           |SELECT query_id, vec_id, label, score FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |                               ORDER BY score, vec_id) AS rn
           |  FROM scored) WHERE rn <= $K
           |ORDER BY query_id, score, vec_id""".stripMargin),
      bench = true
    ),
    // MMR-diversified top-k (beyond the reference): distributed exact
    // top-50 relevance head + Catalyst-computed candidate sim matrix +
    // k-step greedy on the bounded head; the oracle unrolls the greedy
    // loop into k chained argmax CTEs — see graft.knn.Mmr
    Q(
      "mmr_rerank",
      (s, dir) =>
        graft.knn.Mmr.rerank(Tables.embeddings(s, dir), "embedding",
          hashVectorLit(7, D)),
      Some(graft.knn.Mmr.rerankSql("embeddings", "embedding", "vec_id",
        queryKey = 7L, dim = D))
    ),
    // "more like this" (beyond the reference — its query() always takes
    // an external vector): the query IS a stored row's vector, looked up
    // by id IN-PLAN (broadcast 1-row crossJoin, no driver round-trip),
    // the anchor row excluded from its own neighbors
    Q(
      "knn_by_id",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val qv = e.filter(col("vec_id") === 42)
          .select(col("embedding").as("qvec"))
        Knn.search(e.crossJoin(broadcast(qv)), col("embedding"),
            col("qvec"), "cosine", K,
            filter = Some(col("vec_id") =!= 42))
          .select("vec_id", "label", "score")
      },
      Some(
        s"""WITH q AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 42)
           |SELECT vec_id, label,
           |       round(${Knn.distanceSql("cosine", "embedding", "q.v", D)}, 6) AS score
           |FROM embeddings, q
           |WHERE vec_id <> 42
           |ORDER BY score, vec_id LIMIT $K""".stripMargin)
    ),
    // radius search (beyond the reference): ALL rows within a distance
    // threshold rather than a fixed k — the dedup/clustering primitive
    // top-k can't express. The threshold compares the ROUNDED score in
    // both engines (same set either side of the display grid).
    Q(
      "knn_range",
      (s, dir) =>
        Tables.embeddings(s, dir)
          .withColumn("score",
            round(cosineDistance(col("embedding"), hashVectorLit(4, D)), 6))
          .filter(col("score") <= 0.85)
          .select("vec_id", "label", "score")
          .orderBy("score", "vec_id"),
      Some(
        s"""WITH q AS (SELECT ${qvecSql(4)} AS v)
           |SELECT vec_id, label, score FROM (
           |  SELECT vec_id, label,
           |         round(${Knn.distanceSql("cosine", "embedding", "q.v", D)}, 6) AS score
           |  FROM embeddings, q)
           |WHERE score <= CAST(0.85 AS DOUBLE)
           |ORDER BY score, vec_id""".stripMargin)
    ),
    // hard-negative mining (beyond the reference; the contrastive-
    // training primitive): for each ANCHOR row, the k nearest stored
    // vectors with a DIFFERENT label — the "close but wrong" examples a
    // contrastive trainer pairs against the anchor. Three broadcast
    // anchor rows scored against the corpus in one scan; per-anchor
    // top-5 via one rank window (WindowGroupLimit caps per-partition
    // rows before the anchor-key shuffle). At corpus scale the anchor
    // set is a table, not a literal — same plan, bigger broadcast or a
    // shuffle join past the gate.
    Q(
      "knn_hard_negatives",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.embeddings(s, dir)
        val anchors = e.filter(col("vec_id").isin(1, 2, 3))
          .select(col("vec_id").as("anchor_id"), col("embedding").as("av"),
            col("label").as("al"))
        val w = Window.partitionBy("anchor_id").orderBy(col("score"), col("vec_id"))
        e.crossJoin(broadcast(anchors))
          .filter(col("label") =!= col("al") && col("vec_id") =!= col("anchor_id"))
          .withColumn("score",
            round(cosineDistance(col("embedding"), col("av")), 6))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("anchor_id"), col("rn").cast("int").as("rn"),
            col("vec_id"), col("label"), col("score"))
          .orderBy("anchor_id", "rn")
      },
      Some(
        s"""WITH a AS (
           |  SELECT vec_id AS anchor_id, embedding AS av, label AS al
           |  FROM embeddings WHERE vec_id IN (1, 2, 3)),
           |sc AS (
           |  SELECT a.anchor_id, e.vec_id, e.label,
           |         round(${Knn.distanceSql("cosine", "e.embedding", "a.av", D)}, 6)
           |           AS score
           |  FROM embeddings e CROSS JOIN a
           |  WHERE e.label <> a.al AND e.vec_id <> a.anchor_id),
           |rk AS (
           |  SELECT *, row_number() OVER (PARTITION BY anchor_id
           |                               ORDER BY score, vec_id) AS rn
           |  FROM sc)
           |SELECT anchor_id, CAST(rn AS INT) AS rn, vec_id, label, score
           |FROM rk WHERE rn <= 5 ORDER BY anchor_id, rn""".stripMargin)
    ),
    // recommend-by-examples (beyond the reference; the qdrant-style
    // surface): query vector = avg(positives) − negative, examples
    // excluded from the results. The 3 example vectors are a bounded
    // driver collect; the combination arithmetic (float→double, add,
    // halve, subtract) is replayed verbatim by the oracle's CTE.
    Q(
      "knn_recommend",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val ex = e.filter(col("vec_id").isin(42, 77, 13))
          .select("vec_id", "embedding").collect()
          .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
        require(ex.size == 3, s"knn_recommend: example ids missing: ${ex.keySet}")
        val q = (0 until D).map(i =>
          (ex(42L)(i).toDouble + ex(77L)(i).toDouble) / 2.0 -
            ex(13L)(i).toDouble)
        Knn.search(e, col("embedding"),
            org.apache.spark.sql.functions.typedlit(q), "cosine", K,
            filter = Some(!col("vec_id").isin(42, 77, 13)))
          .select("vec_id", "label", "score")
      },
      Some(
        s"""WITH p1 AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 42),
           |p2 AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 77),
           |n1 AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 13),
           |q AS (SELECT list_transform(range($D), i ->
           |        ((p1.e)[i+1]::DOUBLE + (p2.e)[i+1]::DOUBLE) / 2 -
           |        (n1.e)[i+1]::DOUBLE) AS v
           |      FROM p1, p2, n1)
           |SELECT vec_id, label,
           |       round(${Knn.distanceSql("cosine", "embedding", "q.v", D)}, 6) AS score
           |FROM embeddings, q
           |WHERE vec_id NOT IN (42, 77, 13)
           |ORDER BY score, vec_id LIMIT $K""".stripMargin)
    )
  )
}
