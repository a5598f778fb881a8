package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.knn.Ann
import graft.functions.VectorFunctions

/** Persistent LSH index: the banded hyperplane signatures of
  * [[graft.knn.Ann]] materialized as a bucket table instead of being
  * recomputed per query (the reference keeps signatures resident with the
  * collection; `vectordb_optimized.py` keeps every index structure alive
  * across queries).
  *
  * Layout: one row per (band, band value, vector) — each vector appears
  * [[Ann.Bands]] times — written `partitionBy(band_idx, band_val)`:
  * 4 bands × 16 values = 64 directories. A query computes its own band
  * values and reads exactly 4 of them (PartitionFilters — pinned in
  * AnnIndexSpec); candidates are deduped and exact-reranked. The
  * embedding is stored in the bucket row, so a probe never joins back to
  * the corpus — the classic space-for-latency trade of an inverted ANN
  * index (bucket storage = Bands × corpus size).
  *
  * At 100 TB: band_val pruning reads ~Bands/2^BandBits of the index per
  * probe; batch search joins on (band_idx, band_val) instead, the same
  * layout serving both.
  */
object LshIndex {
  /** Bucket rows for a relation: each vector exploded into its
    * [[Ann.Bands]] (band_idx, band_val) keys, carrying the id, the vector
    * (rerank never joins back to the corpus) and any `metaCols` — stored
    * metadata makes a filtered probe push its predicate straight into the
    * bucket scan instead of joining the corpus. Also the candidate
    * generator for self-join sweeps: equi-joining two bucket-row sides on
    * (band_idx, band_val) yields LSH candidate pairs without any
    * all-pairs block join. `withFullSig` adds `fsig` — a hash of ALL
    * band values — so self-join sweeps can feed
    * [[graft.dedup.BucketGuard]]'s hot-bucket thinning. */
  def bucketRows(emb: DataFrame, vecCol: String, idCol: String,
      dim: Int, metaCols: Seq[String] = Nil,
      withFullSig: Boolean = false): DataFrame = {
    val keep = Seq(col(idCol), col(vecCol)) ++ metaCols.map(col)
    val withBands = emb.select(
      keep ++ (0 until Ann.Bands).map(b =>
        Ann.bandCol(col(vecCol), b, dim).as(s"b$b")): _*)
    val sig =
      if (withFullSig)
        Seq(xxhash64((0 until Ann.Bands).map(b => col(s"b$b")): _*).as("fsig"))
      else Nil
    withBands
      .select(keep ++ sig :+
        explode(array((0 until Ann.Bands).map(b =>
          struct(lit(b).as("band_idx"), col(s"b$b").as("band_val"))): _*))
          .as("band"): _*)
      .select(Seq(col("band.band_idx").as("band_idx"),
        col("band.band_val").as("band_val")) ++ keep ++ sig.map(_ => col("fsig")): _*)
  }

  def build(spark: SparkSession, emb: DataFrame, vecCol: String,
      idCol: String, dim: Int, path: String,
      metaCols: Seq[String] = Nil): Unit =
    bucketRows(emb, vecCol, idCol, dim, metaCols)
      .repartition(col("band_idx"), col("band_val"))
      .write.mode("overwrite").partitionBy("band_idx", "band_val")
      .parquet(s"$path/buckets")

  /** Incremental maintenance: a pure insert is a pure bucket-row append —
    * new vectors land in their (band_idx, band_val) partitions, existing
    * rows are untouched (the reference appends to its in-memory index per
    * added document, `hybrid_search.py:77-117`). Caller guarantees new
    * ids; wrap in IndexStore.mutate/advance so a crash mid-append reads
    * as not-ready and rebuilds. */
  def append(spark: SparkSession, newRows: DataFrame, vecCol: String,
      idCol: String, dim: Int, path: String,
      metaCols: Seq[String] = Nil): Unit = {
    val rows = bucketRows(newRows, vecCol, idCol, dim, metaCols)
    IndexStore.requireAppendSchema(spark, s"$path/buckets", rows)
    rows
      .repartition(col("band_idx"), col("band_val"))
      .write.mode("append").partitionBy("band_idx", "band_val")
      .parquet(s"$path/buckets")
    spark.catalog.refreshByPath(s"$path/buckets")
  }

  /** Batch search: the banded signature as a JOIN KEY — every query's
    * bands are computed in-plan, broadcast, and equi-joined against the
    * bucket table; candidates dedup per (query, vector) and exact-rerank
    * with a per-query top-k window. This is the cluster-scale form: one
    * shuffle-free probe join for a whole query batch instead of one scan
    * per query. `queries` = (qid, qvec). Returns (qid, id, score). */
  def searchBatch(spark: SparkSession, path: String, vecCol: String,
      idCol: String, queries: DataFrame, dim: Int, k: Int,
      metric: String = "cosine"): DataFrame = {
    val qBands = queries.select(col("qid"), col("qvec"),
        explode(array((0 until Ann.Bands).map(b =>
          struct(lit(b).as("band_idx"),
            Ann.bandCol(col("qvec"), b, dim).as("band_val"))): _*)).as("band"))
      .select(col("qid"), col("qvec"),
        col("band.band_idx").as("band_idx"),
        col("band.band_val").as("band_val"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score"), col(idCol))
    spark.read.parquet(s"$path/buckets")
      .join(broadcast(qBands), Seq("band_idx", "band_val"))
      .dropDuplicates("qid", idCol) // a pair may collide in several bands
      .withColumn("score",
        round(graft.knn.Knn.distance(metric, col(vecCol), col("qvec")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col(idCol), col("score"))
      .orderBy(col("qid"), col("score"), col(idCol))
  }

  /** DuckDB oracle for [[searchBatch]] over integer query keys whose
    * vectors are hash vectors of the key. */
  def searchBatchSql(relation: String, vecCol: String, idCol: String,
      queryKeys: Seq[Long], dim: Int, k: Int): String = {
    val keys = queryKeys.map(kk => s"($kk)").mkString(", ")
    val qBandRows = (0 until Ann.Bands).map(b =>
      s"SELECT qid, qvec, $b AS band_idx, ${Ann.bandSql("qvec", b, dim)} AS band_val FROM qs")
      .mkString("\nUNION ALL\n")
    val dBandRows = (0 until Ann.Bands).map(b =>
      s"SELECT $idCol, $b AS band_idx, b$b AS band_val FROM d")
      .mkString("\nUNION ALL\n")
    val db = (0 until Ann.Bands).map(b => s"${Ann.bandSql(vecCol, b, dim)} AS b$b")
    s"""WITH qs AS (
       |  SELECT qid, ${graft.functions.VectorFunctions.hashVectorSql("qid", dim)} AS qvec
       |  FROM (VALUES $keys) t(qid)),
       |qb AS ($qBandRows),
       |d AS (SELECT $idCol, $vecCol, ${db.mkString(", ")} FROM $relation),
       |dbands AS ($dBandRows),
       |cand AS (
       |  SELECT DISTINCT qb.qid, dbands.$idCol
       |  FROM dbands JOIN qb
       |    ON qb.band_idx = dbands.band_idx AND qb.band_val = dbands.band_val),
       |scored AS (
       |  SELECT c.qid, c.$idCol,
       |    round(${graft.functions.VectorFunctions.cosineDistanceSql(s"e.$vecCol", "qs.qvec", dim)}, 6) AS score
       |  FROM cand c
       |  JOIN $relation e ON e.$idCol = c.$idCol
       |  JOIN qs ON qs.qid = c.qid),
       |ranked AS (
       |  SELECT qid, $idCol, score,
       |         row_number() OVER (PARTITION BY qid ORDER BY score, $idCol) AS rnk
       |  FROM scored)
       |SELECT qid, $idCol, score FROM ranked WHERE rnk <= $k
       |ORDER BY qid, score, $idCol""".stripMargin
  }

  /** Probe the 4 query buckets, dedup candidates, exact rerank.
    * Query band values are computed driver-side (`Ann.bandValues`, the
    * same left-to-right double accumulation as the build's codegen
    * kernel — bit-identical, pinned by AnnSpec), so a single-query probe
    * launches no job before the probe scan itself.
    *
    * `filter` (over metadata columns stored in the bucket rows) applies
    * BEFORE the rerank — exact filtered top-k among matching candidates,
    * and the predicate pushes down to the bucket scan alongside the
    * partition probe (strictly better than the reference's over-fetch &
    * post-filter, `vectordb_optimized.py:530-573`, which can under-fill
    * k). `metric` reranks with the collection's configured distance.
    *
    * `multiProbe` additionally probes, per band, every bucket whose
    * value differs from the query's in ONE sign bit — the classic
    * multi-probe LSH recall knob (Lv et al., VLDB'07): a near neighbor
    * that lands just across one hyperplane is still found. Candidates
    * grow from Bands to Bands·(1+BandBits) partitions (4 → 20 of 64);
    * the probe stays a partition filter, and the result's top-k is
    * always at-least-as-close as the single-probe result (candidate
    * superset — pinned in IndexSpec). */
  def search(spark: SparkSession, path: String, vecCol: String,
      idCol: String, queryVec: Seq[Double], dim: Int, k: Int,
      filter: Option[org.apache.spark.sql.Column] = None,
      metric: String = "cosine",
      multiProbe: Boolean = false): DataFrame = {
    val qv = typedlit(queryVec)
    val qb = Ann.bandValues(queryVec, dim)
    val probe = (0 until Ann.Bands)
      .map { b =>
        val vals = Ann.probeVals(qb(b), multiProbe)
        col("band_idx") === b && col("band_val").isin(vals: _*)
      }
      .reduce(_ || _)
    val base = spark.read.parquet(s"$path/buckets").filter(probe)
    filter.map(base.filter).getOrElse(base)
      .dropDuplicates(idCol) // a candidate may collide in several bands
      .withColumn("score",
        round(graft.knn.Knn.distance(metric, col(vecCol), qv), 6))
      .select(idCol, "score")
      .orderBy(col("score"), col(idCol))
      .limit(k)
  }
}
