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
  def build(spark: SparkSession, emb: DataFrame, vecCol: String,
      idCol: String, dim: Int, path: String): Unit = {
    val withBands = emb.select(
      Seq(col(idCol), col(vecCol)) ++
        (0 until Ann.Bands).map(b =>
          Ann.bandCol(col(vecCol), b, dim).as(s"b$b")): _*)
    withBands
      .select(col(idCol), col(vecCol),
        explode(array((0 until Ann.Bands).map(b =>
          struct(lit(b).as("band_idx"), col(s"b$b").as("band_val"))): _*))
          .as("band"))
      .select(col("band.band_idx").as("band_idx"),
        col("band.band_val").as("band_val"), col(idCol), col(vecCol))
      .repartition(col("band_idx"), col("band_val"))
      .write.mode("overwrite").partitionBy("band_idx", "band_val")
      .parquet(s"$path/buckets")
  }

  /** Probe the 4 query buckets, dedup candidates, exact cosine rerank.
    * Query band values are computed through the engine (one tiny job) so
    * the sign arithmetic is bit-identical with the build. */
  def search(spark: SparkSession, path: String, vecCol: String,
      idCol: String, queryVec: Seq[Double], dim: Int, k: Int): DataFrame = {
    val qv = typedlit(queryVec)
    val qb = spark.range(1)
      .select((0 until Ann.Bands).map(b => Ann.bandCol(qv, b, dim)): _*)
      .collect()(0)
    val probe = (0 until Ann.Bands)
      .map(b => col("band_idx") === b && col("band_val") === qb.getInt(b))
      .reduce(_ || _)
    spark.read.parquet(s"$path/buckets")
      .filter(probe)
      .dropDuplicates(idCol) // a candidate may collide in several bands
      .withColumn("score",
        round(VectorFunctions.cosineDistance(col(vecCol), qv), 6))
      .select(idCol, "score")
      .orderBy(col("score"), col(idCol))
      .limit(k)
  }
}
