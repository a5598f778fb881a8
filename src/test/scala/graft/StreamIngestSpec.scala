package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.VectorDb
import graft.stream.ChangeFeed

/** Streaming ingest into the collection store — the reference's
  * StreamingBinaryWriter (binary_persistence.py:212-274) as a Structured
  * Streaming foreachBatch sink: each microbatch upserts into the
  * parquet-backed collection, so restarts/retries are idempotent by key.
  */
class StreamIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("foreachBatch sink upserts each microbatch into a collection") {
    val root = Files.createTempDirectory("graft_ingest").toString
    val db = new VectorDb(spark, root)
    val coll = db.createCollection("events_sink", dimensions = 0, metric = "none")

    val stream = ChangeFeed.readStream(spark, SparkTestSession.sf)
      .select(concat(lit("e:"), col("event_id")).as("id"),
        col("event_type"), col("value"))

    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        coll.upsert(batch)
      }
      .start()
    try {
      q.processAllAvailable()
      val expected = ChangeFeed
        .matched(core.Tables.events(spark, SparkTestSession.sf),
          ChangeFeed.Subscription())
        .count()
      assert(coll.count() == expected)
      // idempotent under reprocessing: upserting the batch again does
      // not duplicate rows (retry semantics)
      coll.upsert(core.Tables.events(spark, SparkTestSession.sf)
        .select(concat(lit("e:"), col("event_id")).as("id"),
          col("event_type"), col("value")))
      assert(coll.count() == expected)
    } finally {
      q.stop()
      db.dropCollection("events_sink")
    }
  }

  test("foreachBatch maintains a BM25 index incrementally from a doc stream") {
    import graft.index.{Bm25Index, IndexStore}
    val idx = Files.createTempDirectory("graft_stream_idx").toString + "/bm25"
    val docs = core.Tables.documents(spark, SparkTestSession.sf)
      .orderBy("doc_id").limit(30).cache()
    // seed the index with the first half of the corpus
    IndexStore.ensure(spark, idx)(p =>
      Bm25Index.build(spark, docs.filter(col("doc_id") < 15), p))
    // stream the remaining docs in as a file stream; each microbatch
    // appends its postings — the reference's per-document index update
    // (hybrid_search.py:105-117) at microbatch granularity
    val src = Files.createTempDirectory("graft_doc_stream").toString
    docs.filter(col("doc_id") >= 15).write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema(docs.schema)
      .parquet(src)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val newDocs = batch.select("doc_id", "text").localCheckpoint()
        if (newDocs.count() > 0)
          IndexStore.mutate(spark, idx)(p =>
            Bm25Index.append(spark, newDocs, p))
      }
      .start()
    try {
      q.processAllAvailable()
      // the incrementally-maintained index answers exactly like a fresh
      // build over the full corpus
      val terms = Seq("spark", "join", "filter")
      val a = Bm25Index.search(spark, idx, terms, 10).collect().toSeq
      val full = Files.createTempDirectory("graft_full_idx").toString + "/bm25"
      IndexStore.ensure(spark, full)(p => Bm25Index.build(spark, docs, p))
      val b = Bm25Index.search(spark, full, terms, 10).collect().toSeq
      assert(a == b && a.nonEmpty)
    } finally q.stop()
  }

  test("foreachBatch maintains an LSH index incrementally from a vector stream") {
    import graft.index.{IndexStore, LshIndex}
    val D = core.Tables.EmbeddingDim
    val idx = Files.createTempDirectory("graft_stream_lsh").toString + "/lsh"
    // localCheckpoint, not cache() — a CacheManager entry on the shared
    // session would swap later embeddings scans to InMemoryRelation
    val emb = core.Tables.embeddings(spark, SparkTestSession.sf)
      .localCheckpoint()
    IndexStore.ensure(spark, idx)(p =>
      LshIndex.build(spark, emb.filter(col("vec_id") < 30),
        "embedding", "vec_id", D, p))
    val src = Files.createTempDirectory("graft_emb_stream").toString
    emb.filter(col("vec_id") >= 30).write.mode("overwrite").parquet(src)
    val q = spark.readStream.schema(emb.schema).parquet(src)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.localCheckpoint()
        if (rows.count() > 0)
          IndexStore.mutate(spark, idx)(p =>
            LshIndex.append(spark, rows, "embedding", "vec_id", D, p))
      }
      .start()
    try {
      q.processAllAvailable()
      val qv = graft.functions.VectorFunctions.hashVectorValues(11L, D)
      val a = LshIndex.search(spark, idx, "embedding", "vec_id", qv, D, 10)
        .collect().toSeq
      val full = Files.createTempDirectory("graft_full_lsh").toString + "/lsh"
      IndexStore.ensure(spark, full)(p =>
        LshIndex.build(spark, emb, "embedding", "vec_id", D, p))
      val b = LshIndex.search(spark, full, "embedding", "vec_id", qv, D, 10)
        .collect().toSeq
      assert(a == b && a.nonEmpty)
    } finally q.stop()
  }

  test("foreachBatch maintains an IVF-PQ index incrementally from a vector stream") {
    import graft.index.{IndexStore, IvfPqIndex}
    val D = core.Tables.EmbeddingDim
    val idx = Files.createTempDirectory("graft_stream_ivfpq").toString + "/ivfpq"
    val emb = core.Tables.embeddings(spark, SparkTestSession.sf)
      .localCheckpoint()
    val m = graft.knn.Ann.fixedIvfModel(graft.index.Indexes.IvfCells, D)
    val cb = graft.quant.ProductQuant.fixedCodebooks(D, 8, 16)
    IndexStore.ensure(spark, idx)(p =>
      IvfPqIndex.build(spark, emb.filter(col("vec_id") < 30),
        "embedding", "vec_id", m, cb, p))
    val src = Files.createTempDirectory("graft_emb_stream2").toString
    emb.filter(col("vec_id") >= 30).write.mode("overwrite").parquet(src)
    val q = spark.readStream.schema(emb.schema).parquet(src)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.localCheckpoint()
        if (rows.count() > 0)
          IndexStore.mutate(spark, idx)(p =>
            IvfPqIndex.append(spark, rows, "embedding", "vec_id", p))
      }
      .start()
    try {
      q.processAllAvailable()
      val qv = graft.functions.VectorFunctions.hashVectorValues(11L, D)
      val a = IvfPqIndex.search(spark, idx, "embedding", "vec_id", qv, 4, 10)
        .collect().toSeq
      val full = Files.createTempDirectory("graft_full_ivfpq").toString + "/ivfpq"
      IndexStore.ensure(spark, full)(p =>
        IvfPqIndex.build(spark, emb, "embedding", "vec_id", m, cb, p))
      val b = IvfPqIndex.search(spark, full, "embedding", "vec_id", qv, 4, 10)
        .collect().toSeq
      assert(a == b && a.nonEmpty)
    } finally q.stop()
  }

  test("streaming corpus prep (quality gate + fingerprint dedup) " +
      "matches the batch pipeline") {
    import graft.text.TextAnalysis._
    import graft.stream.StatefulDedup
    val docs = core.Tables.documents(spark, SparkTestSession.sf)
      .orderBy("doc_id").limit(30)
      .select("doc_id", "text").cache()
    // batch 1 = originals; batch 2 = byte-identical duplicates under new
    // ids (the re-crawl shape) — the stream must keep only batch 1's
    val dupes = docs.select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val src = Files.createTempDirectory("graft_corpus_stream").toString
    docs.write.mode("overwrite").parquet(s"$src/b1")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/b*")
    val gate = (df: DataFrame) => df
      .filter(qualityScore("text") > 0.3)
      .withColumn("fp", fingerprint("text"))
    val q = StatefulDedup.firstDocByFingerprint(gate(stream), "fp", "doc_id")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("corpus_prep_sink")
      .start()
    try {
      q.processAllAvailable()
      dupes.write.mode("overwrite").parquet(s"$src/b2")
      q.processAllAvailable()
      val got = spark.table("corpus_prep_sink")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      // batch equivalent over the union: min doc_id per fingerprint
      val expect = gate(docs.union(dupes))
        .groupBy("fp").agg(min("doc_id").as("doc_id"))
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expect && got.nonEmpty)
      // every duplicate id was dropped by the stateful dedup
      assert(got.forall(_ < 10000))
    } finally q.stop()
  }
}
