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
    )
  )
}
