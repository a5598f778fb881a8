package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark pipeline over a testdata scale
  * directory plus (when SQL-expressible) an equivalent DuckDB oracle.
  * Column names/types and row ordering determinism must match between the
  * two (driver hashes values after sorting columns by name).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Catalog {
  def all: Seq[Q] =
    queries.KnnQueries.qs ++
      queries.AggQueries.qs ++
      queries.FilterQueries.qs ++
      queries.TextQueries.qs ++
      queries.DedupQueries.qs ++
      queries.Bm25Queries.qs ++
      queries.QuantQueries.qs ++
      queries.GraphQueries.qs ++
      queries.GraphVectorQueries.qs ++
      queries.StreamQueries.qs ++
      queries.CrudQueries.qs ++
      queries.AnnQueries.qs ++
      queries.EmbedQueries.qs ++
      queries.MediaQueries.qs ++
      queries.PipelineQueries.qs ++
      queries.SketchQueries.qs ++
      queries.CollectionQueries.qs

  lazy val byName: Map[String, Q] =
    all.map(q => q.name -> q).toMap.withDefault { n =>
      throw new NoSuchElementException(
        s"unknown query '$n'; available: ${all.map(_.name).sorted.mkString(", ")}")
    }

  /** Static I/O class per entry (VERDICT r16 stretch #7): "file" =
    * a timed rep's wall is materially exposed to the box's filesystem
    * state BEYOND the shared (page-cache-resident, ~15 MB at sf0.1)
    * corpus scan — it re-reads persisted index/collection dirs per rep,
    * writes files per rep (collection lifecycle, gv_persistence), or
    * drives streaming file sources/sinks/checkpoints. Everything else
    * is "compute". The tag is coarse and for band-fire ADJUDICATION
    * (r16 run 2: nine fires, all file-class, flat CPU probe — the
    * argument "every fired entry is file-heavy" was prose; now it is
    * an artifact field next to io_ratio), not a measured profile.
    * CatalogSpec pins that every tagged name exists. */
  val FileHeavy: Set[String] = Set(
    // persisted-ANN-index readers (IndexStore parquet per rep)
    "ann_lsh_indexed", "ann_lsh_filtered", "ann_lsh_multiprobe",
    "ann_lsh_batch", "ann_lsh_bucket_stats",
    "ann_ivf_batch", "ann_ivf_partitioned", "ann_ivf_filtered",
    "ann_ivf_cell_stats",
    "ann_ivfpq_search", "ann_ivfpq_batch", "ann_ivfpq_filtered",
    "sql_ann_topk", "sql_ann_topk_filtered", "sql_ann_topk_l2",
    "sql_ann_topk_pq", "sql_ann_topk_ip",
    // recall gates sweep every persisted index family
    "ann_recall_report", "ann_recall_trained", "near_dup_recall",
    // persisted BM25 postings / quantized-index readers
    "bm25_index_build", "bm25_search", "bm25_index_stats",
    "bm25_filtered", "bm25_snippets", "bm25_prf_expand",
    "bq_index_search", "sq_index_search", "pq_index_search",
    // collection store: per-rep parquet round-trips (lifecycle entries
    // also WRITE per rep)
    "collection_ann_search", "collection_ann_filtered",
    "collection_ann_batch", "collection_ann_l2",
    "collection_ann_l2_filtered", "collection_ann_l2_batch",
    "collection_ann_ip", "collection_ann_ip_filtered",
    "collection_ann_ip_batch", "collection_bulk_roundtrip",
    "collection_compact", "collection_hybrid_search",
    "collection_lifecycle", "collection_search_events",
    "collection_text_batch", "collection_text_filtered",
    "collection_text_search",
    // live streaming: file sources/sinks + checkpoint dirs
    "stream_ann_live", "stream_asof_live", "stream_dedup_live",
    "stream_interval_join_live", "stream_tumbling_live",
    // per-rep persistence round-trips
    "gv_persistence", "embed_cached")

  def ioClass(name: String): String =
    if (FileHeavy(name)) "file" else "compute"
}
