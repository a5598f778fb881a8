package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.knn.Ann

/** Build-once wiring of the persistent indexes to a testdata directory:
  * each accessor returns the index path, building it only when absent or
  * when the source parquet generation changed (IndexStore fingerprint).
  * Catalog queries call these instead of re-deriving index relations per
  * query — search cost is then probe + rerank, with build amortized across
  * every query of a session and across sessions (the tables are on disk).
  */
object Indexes {
  private val D = Tables.EmbeddingDim
  val IvfCells = 16

  /** BM25 inverted index over the documents table. */
  def bm25Docs(spark: SparkSession, dir: String): String =
    IndexStore.ensure(spark,
      IndexStore.path(spark, dir, "bm25docs", Seq(s"$dir/documents.parquet"))) {
      p => Bm25Index.build(spark, Tables.documents(spark, dir), p)
    }

  /** Hybrid corpus index: materialized (doc_id, embedding) vectors table
    * plus a BM25 index, both over the documents⋈embeddings corpus (at
    * sf0.1 only 2000 of 5000 docs carry embeddings — the hybrid corpus is
    * the join, exactly the relation the oracle's corpus CTE defines). */
  def hybrid(spark: SparkSession, dir: String): String =
    IndexStore.ensure(spark,
      IndexStore.path(spark, dir, "hybrid",
        Seq(s"$dir/documents.parquet", s"$dir/embeddings.parquet"))) { p =>
      val corpus = Tables.documents(spark, dir)
        .join(Tables.embeddings(spark, dir), col("doc_id") === col("vec_id"))
        .select("doc_id", "text", "embedding")
        .persist()
      try {
        corpus.select("doc_id", "embedding")
          .write.mode("overwrite").parquet(s"$p/vectors")
        Bm25Index.build(spark, corpus.select("doc_id", "text"), p)
      } finally { corpus.unpersist(); () }
    }

  /** LSH bucket index over the embeddings table. */
  def lshEmb(spark: SparkSession, dir: String): String =
    IndexStore.ensure(spark,
      IndexStore.path(spark, dir, "lshemb", Seq(s"$dir/embeddings.parquet"))) {
      p => LshIndex.build(spark, Tables.embeddings(spark, dir),
        "embedding", "vec_id", D, p)
    }

  /** IVF cell-partitioned index over the embeddings table (fixed
    * deterministic codebook — see Ann.fixedIvfModel). */
  def ivfEmb(spark: SparkSession, dir: String): String =
    IndexStore.ensure(spark,
      IndexStore.path(spark, dir, "ivfemb", Seq(s"$dir/embeddings.parquet"))) {
      p => IvfIndex.build(spark, Tables.embeddings(spark, dir),
        "embedding", "vec_id", Ann.fixedIvfModel(IvfCells, D), p)
    }

  /** Materialized node embeddings for graph+vector search: at scale an
    * embedded node's vector is a STORED column, not derived per query —
    * here the customer hash-vectors are written once (the interpreted
    * hash-vector HOF otherwise re-runs over every customer on every
    * semantic search). */
  def custEmb(spark: SparkSession, dir: String): String =
    IndexStore.ensure(spark,
      IndexStore.path(spark, dir, "custemb", Seq(s"$dir/customer.parquet"))) {
      p =>
        Tables.customer(spark, dir).select(
            concat(lit("c:"), col("c_custkey")).as("id"),
            graft.functions.VectorFunctions
              .hashVector(col("c_custkey"), D).as("embedding"))
          .write.mode("overwrite").parquet(s"$p/vectors")
    }

  /** BQ packed-bits index over the embeddings table (2 longs/vector). */
  def bqEmb(spark: SparkSession, dir: String): String =
    IndexStore.ensure(spark,
      IndexStore.path(spark, dir, "bqemb", Seq(s"$dir/embeddings.parquet"))) {
      p => QuantIndex.buildBq(spark, Tables.embeddings(spark, dir),
        "embedding", "vec_id", p)
    }

  /** PQ codes index over the embeddings table (m bytes/vector — the
    * strongest at-rest compression; fixed deterministic codebooks). */
  def pqEmb(spark: SparkSession, dir: String): String =
    IndexStore.ensure(spark,
      IndexStore.path(spark, dir, "pqemb", Seq(s"$dir/embeddings.parquet"))) {
      p => QuantIndex.buildPq(spark, Tables.embeddings(spark, dir),
        "embedding", "vec_id",
        graft.quant.ProductQuant.fixedCodebooks(D, 8, 16), p)
    }

  /** SQ codes index over the embeddings table (1 code/dim). */
  def sqEmb(spark: SparkSession, dir: String): String =
    IndexStore.ensure(spark,
      IndexStore.path(spark, dir, "sqemb", Seq(s"$dir/embeddings.parquet"))) {
      p => QuantIndex.buildSq(spark, Tables.embeddings(spark, dir),
        "embedding", "vec_id", D, p)
    }

  /** Build every index for a directory (bench build phase). */
  def buildAll(spark: SparkSession, dir: String): Unit = {
    bm25Docs(spark, dir); hybrid(spark, dir); lshEmb(spark, dir)
    ivfEmb(spark, dir); bqEmb(spark, dir); sqEmb(spark, dir)
    pqEmb(spark, dir); custEmb(spark, dir); ()
  }

  /** Drop every index for a directory so the next buildAll pays the full
    * construction cost (bench measures build and search separately). */
  def invalidateAll(spark: SparkSession, dir: String): Unit = {
    IndexStore.invalidate(spark,
      IndexStore.path(spark, dir, "bm25docs", Seq(s"$dir/documents.parquet")))
    IndexStore.invalidate(spark,
      IndexStore.path(spark, dir, "hybrid",
        Seq(s"$dir/documents.parquet", s"$dir/embeddings.parquet")))
    IndexStore.invalidate(spark,
      IndexStore.path(spark, dir, "lshemb", Seq(s"$dir/embeddings.parquet")))
    IndexStore.invalidate(spark,
      IndexStore.path(spark, dir, "ivfemb", Seq(s"$dir/embeddings.parquet")))
    IndexStore.invalidate(spark,
      IndexStore.path(spark, dir, "bqemb", Seq(s"$dir/embeddings.parquet")))
    IndexStore.invalidate(spark,
      IndexStore.path(spark, dir, "sqemb", Seq(s"$dir/embeddings.parquet")))
    IndexStore.invalidate(spark,
      IndexStore.path(spark, dir, "pqemb", Seq(s"$dir/embeddings.parquet")))
    IndexStore.invalidate(spark,
      IndexStore.path(spark, dir, "custemb", Seq(s"$dir/customer.parquet")))
  }
}
