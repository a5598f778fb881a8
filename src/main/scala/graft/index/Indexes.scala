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
  *
  * One registry row per index drives the accessor, [[buildAll]] AND
  * [[invalidateAll]] — adding an index in one place keeps the bench's
  * "force-rebuilt so the cost is real" guarantee honest.
  */
object Indexes {
  private val D = Tables.EmbeddingDim
  val IvfCells = 16

  private final case class Spec(
      kind: String,
      sources: String => Seq[String],
      build: (SparkSession, String, String) => Unit)

  private def docsSrc(d: String) = Seq(s"$d/documents.parquet")
  private def embSrc(d: String) = Seq(s"$d/embeddings.parquet")

  private val specs: Seq[Spec] = Seq(
    Spec("bm25docs", docsSrc,
      (s, d, p) => Bm25Index.build(s, Tables.documents(s, d), p)),
    Spec("hybrid", d => docsSrc(d) ++ embSrc(d), (s, d, p) => {
      val corpus = Tables.documents(s, d)
        .join(Tables.embeddings(s, d), col("doc_id") === col("vec_id"))
        .select("doc_id", "text", "embedding")
        .persist()
      try {
        corpus.select("doc_id", "embedding")
          .write.mode("overwrite").parquet(s"$p/vectors")
        Bm25Index.build(s, corpus.select("doc_id", "text"), p)
      } finally { corpus.unpersist(); () }
    }),
    // label travels into the bucket rows so filtered ANN pushes its
    // metadata predicate into the bucket scan (no corpus join)
    Spec("lshemb", embSrc, (s, d, p) =>
      LshIndex.build(s, Tables.embeddings(s, d), "embedding", "vec_id", D, p,
        metaCols = Seq("label"))),
    Spec("ivfemb", embSrc, (s, d, p) =>
      IvfIndex.build(s, Tables.embeddings(s, d), "embedding", "vec_id",
        Ann.fixedIvfModel(IvfCells, D), p, metaCols = Seq("label"))),
    Spec("bqemb", embSrc, (s, d, p) =>
      QuantIndex.buildBq(s, Tables.embeddings(s, d), "embedding", "vec_id", p)),
    Spec("sqemb", embSrc, (s, d, p) =>
      QuantIndex.buildSq(s, Tables.embeddings(s, d), "embedding", "vec_id", D, p)),
    Spec("pqemb", embSrc, (s, d, p) =>
      QuantIndex.buildPq(s, Tables.embeddings(s, d), "embedding", "vec_id",
        graft.quant.ProductQuant.fixedCodebooks(D, 8, 16), p)),
    // IVF-PQ: cell partitions + in-cell PQ codes + raw vectors for the
    // rerank pool — the composed billion-scale layout (label stored for
    // filtered probes, like lshemb/ivfemb)
    Spec("ivfpqemb", embSrc, (s, d, p) =>
      IvfPqIndex.build(s, Tables.embeddings(s, d), "embedding", "vec_id",
        Ann.fixedIvfModel(IvfCells, D),
        graft.quant.ProductQuant.fixedCodebooks(D, 8, 16), p,
        metaCols = Seq("label"))),
    // MIPS augmented-cell layout for ip-metric top-k (true-dot rerank)
    Spec("mipsemb", embSrc, (s, d, p) =>
      MipsIndex.build(s, Tables.embeddings(s, d), "embedding", "vec_id",
        IvfCells, p, metaCols = Seq("label"))),
    Spec("custemb", d => Seq(s"$d/customer.parquet"), (s, d, p) =>
      Tables.customer(s, d).select(
          concat(lit("c:"), col("c_custkey")).as("id"),
          graft.functions.VectorFunctions
            .hashVector(col("c_custkey"), D).as("embedding"))
        .write.mode("overwrite").parquet(s"$p/vectors")),
    // materialized text embeddings of the documents corpus — the
    // reference's EmbeddingCollection embeds on add and stores the vector
    // with the row (embeddings.py:521-609); graft's equivalent is an
    // embed-once vectors table, so text-kNN queries scan stored vectors
    // instead of re-hashing the corpus per query
    Spec("docemb", docsSrc, (s, d, p) => {
      val e = graft.embed.HashEmbedder(D)
      // localCheckpoint barrier: without it CollapseProject inlines the
      // O(len) text hash into all D vector lambdas (see EmbedQueries)
      Tables.documents(s, d)
        .select(col("doc_id"), e.textKey("text").as("key"))
        .localCheckpoint()
        .select(col("doc_id"), e.embedKey(col("key")).as("embedding"))
        .write.mode("overwrite").parquet(s"$p/vectors")
    })
  )

  private def ensureKind(spark: SparkSession, dir: String, kind: String)
      : String = {
    val sp = specs.find(_.kind == kind).get
    IndexStore.ensure(spark,
      IndexStore.path(spark, dir, sp.kind, sp.sources(dir)))(
      p => sp.build(spark, dir, p))
  }

  /** BM25 inverted index over the documents table. */
  def bm25Docs(spark: SparkSession, dir: String): String =
    ensureKind(spark, dir, "bm25docs")

  /** Hybrid corpus index: materialized (doc_id, embedding) vectors table
    * plus a BM25 index, both over the documents⋈embeddings corpus (at
    * sf0.1 only 2000 of 5000 docs carry embeddings — the hybrid corpus is
    * the join, exactly the relation the oracle's corpus CTE defines). */
  def hybrid(spark: SparkSession, dir: String): String =
    ensureKind(spark, dir, "hybrid")

  /** LSH bucket index over the embeddings table. */
  def lshEmb(spark: SparkSession, dir: String): String =
    ensureKind(spark, dir, "lshemb")

  /** IVF cell-partitioned index over the embeddings table (fixed
    * deterministic codebook — see Ann.fixedIvfModel). */
  def ivfEmb(spark: SparkSession, dir: String): String =
    ensureKind(spark, dir, "ivfemb")

  /** BQ packed-bits index over the embeddings table (2 longs/vector). */
  def bqEmb(spark: SparkSession, dir: String): String =
    ensureKind(spark, dir, "bqemb")

  /** SQ codes index over the embeddings table (1 code/dim). */
  def sqEmb(spark: SparkSession, dir: String): String =
    ensureKind(spark, dir, "sqemb")

  /** PQ codes index over the embeddings table (m bytes/vector — the
    * strongest at-rest compression; fixed deterministic codebooks). */
  def pqEmb(spark: SparkSession, dir: String): String =
    ensureKind(spark, dir, "pqemb")

  /** IVF-PQ composed index over the embeddings table (partition-pruned
    * probe + codes-only ADC scan + exact rerank; fixed models). */
  def ivfPqEmb(spark: SparkSession, dir: String): String =
    ensureKind(spark, dir, "ivfpqemb")

  /** MIPS augmented-cell index over the embeddings table (ip metric). */
  def mipsEmb(spark: SparkSession, dir: String): String =
    ensureKind(spark, dir, "mipsemb")

  /** Materialized node embeddings for graph+vector search: at scale an
    * embedded node's vector is a STORED column, not derived per query. */
  def custEmb(spark: SparkSession, dir: String): String =
    ensureKind(spark, dir, "custemb")

  /** Materialized text embeddings of the documents corpus (embed once at
    * build; text-kNN then scans stored vectors). */
  def docEmb(spark: SparkSession, dir: String): String =
    ensureKind(spark, dir, "docemb")

  /** Build every index for a directory (bench build phase). The builds
    * are independent (distinct IndexStore paths, per-path locks), so
    * they are SUBMITTED concurrently — Spark's scheduler interleaves the
    * jobs and the many small build stages stop serializing on driver
    * round-trips. Failures propagate like the sequential form. */
  def buildAll(spark: SparkSession, dir: String): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(
      Future.traverse(specs)(sp => Future(ensureKind(spark, dir, sp.kind))),
      Duration.Inf)
    ()
  }

  /** Drop every index for a directory so the next buildAll pays the full
    * construction cost (bench measures build and search separately). */
  def invalidateAll(spark: SparkSession, dir: String): Unit =
    specs.foreach(sp => IndexStore.invalidate(spark,
      IndexStore.path(spark, dir, sp.kind, sp.sources(dir))))
}
