package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.knn.Ann

/** Persistent IVF index: the cell-partitioned corpus layout of
  * [[Ann.writePartitioned]] plus the centroid codebook stored alongside,
  * so a searcher loads the model with the index (the reference persists
  * quantizer state with the collection — `binary_persistence.py:333-385`,
  * index save/load `vectordb_optimized.py`).
  *
  * Layout:
  *   centroids/ (cell, centroid)       — the codebook, cells rows
  *   cells/     …/cell=N/…parquet      — corpus partitioned by cell
  *
  * A probe reads nprobe/cells of the files (PartitionFilters — pinned in
  * AnnSpec); cell assignment ran once at build. This is the durable
  * batch-built ANN shape for a corpus too large to scan per query.
  */
object IvfIndex {
  def build(spark: SparkSession, emb: DataFrame, vecCol: String,
      idCol: String, m: Ann.IvfModel, path: String,
      metaCols: Seq[String] = Nil, stringIds: Boolean = false): Unit = {
    import spark.implicits._
    m.centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    Ann.writePartitioned(emb, vecCol, idCol, m, s"$path/cells",
      metaCols = metaCols, stringIds = stringIds)
  }

  /** Incremental maintenance: assign cells for the NEW rows only against
    * the stored codebook and append them to their cell partitions —
    * existing rows and centroids are untouched. Caller guarantees new
    * ids; wrap in IndexStore.mutate/advance so a crash mid-append reads
    * as not-ready and rebuilds. */
  def append(spark: SparkSession, newRows: DataFrame, vecCol: String,
      idCol: String, path: String, metaCols: Seq[String] = Nil,
      stringIds: Boolean = false): Unit = {
    Ann.writePartitioned(newRows, vecCol, idCol, loadModel(spark, path),
      s"$path/cells", mode = "append", metaCols = metaCols,
      stringIds = stringIds)
    spark.catalog.refreshByPath(s"$path/cells")
  }

  def loadModel(spark: SparkSession, path: String): Ann.IvfModel =
    Ann.IvfModel(
      spark.read.parquet(s"$path/centroids").orderBy("cell")
        .collect().map(_.getSeq[Double](1)).toSeq)

  def search(spark: SparkSession, path: String, vecCol: String,
      idCol: String, queryVec: Seq[Double], nprobe: Int, k: Int,
      filter: Option[org.apache.spark.sql.Column] = None,
      metric: String = "cosine"): DataFrame =
    Ann.searchPartitioned(spark, s"$path/cells", vecCol, idCol,
      loadModel(spark, path), queryVec, nprobe, k, filter, metric)

  def searchBatch(spark: SparkSession, path: String, vecCol: String,
      idCol: String, queries: Seq[(Long, Seq[Double])], nprobe: Int,
      k: Int, metric: String = "cosine"): DataFrame =
    Ann.searchBatchPartitioned(spark, s"$path/cells", vecCol, idCol,
      loadModel(spark, path), queries, nprobe, k, metric)
}
