package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.functions.VectorFunctions._
import graft.index.{Indexes, LshIndex}
import graft.plans.{AnnTopK, IndexedTables}

/** The index-aware top-k rewrite: ORDER BY cosine-distance LIMIT k over a
  * registered table must be served from the LSH bucket index (partition
  * probe in the plan) and return exactly what the programmatic
  * LshIndex.search returns; unregistered tables keep the exact full-scan
  * plan.
  */
class AnnTopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  private val D = Tables.EmbeddingDim
  private val K = 10

  private def topK() = {
    val qc = typedlit(hashVectorValues(11L, D))
    Tables.embeddings(spark, sf)
      .orderBy(round(cosineDistance(col("embedding"), qc), 6), col("vec_id"))
      .limit(K)
      .select(col("vec_id"),
        round(cosineDistance(col("embedding"), qc), 6).as("score"))
      .orderBy("score", "vec_id")
  }

  test("registered table: top-k-by-distance is served from the LSH index") {
    AnnTopK.install(spark)
    IndexedTables.register(spark, s"$sf/embeddings.parquet",
      "embedding", "vec_id", D, Indexes.lshEmb(spark, sf))
    try {
      val q = topK()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("band_idx") &&
        plan.contains("PartitionFilters: ["), plan)
      val a = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = LshIndex.search(spark, Indexes.lshEmb(spark, sf),
          "embedding", "vec_id", hashVectorValues(11L, D), D, K)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(a == b && a.nonEmpty)
    } finally IndexedTables.clear()
  }

  test("while registered, a projected-score sort is NOT captured") {
    // every other catalog query sorts on a score ATTRIBUTE produced by a
    // projection (knn_cosine's shape below) — the rewrite must only
    // match an inline distance expression in the sort key, so arming the
    // registry for sql_ann_topk cannot contaminate the rest of the
    // catalog running on the same session
    AnnTopK.install(spark)
    IndexedTables.register(spark, s"$sf/embeddings.parquet",
      "embedding", "vec_id", D, Indexes.lshEmb(spark, sf))
    try {
      val qc = typedlit(hashVectorValues(11L, D))
      val q = Tables.embeddings(spark, sf)
        .withColumn("score", round(cosineDistance(col("embedding"), qc), 6))
        .orderBy(col("score"), col("vec_id"))
        .limit(K)
        .select("vec_id", "score")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("band_idx"), plan)
      assert(plan.contains("TakeOrderedAndProject"), plan)
    } finally IndexedTables.clear()
  }

  test("unregistered table: the exact full-scan plan is untouched") {
    AnnTopK.install(spark)
    IndexedTables.clear()
    val plan = topK().queryExecution.executedPlan.toString
    assert(!plan.contains("band_idx"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("a rewritten table declines: stale registration never serves") {
    // the registry pins an indexPath at register time; if the table's
    // parquet is regenerated afterwards the pinned index holds the OLD
    // generation's candidates — lookup must decline (fingerprint suffix
    // no longer matches the live files) and leave the exact plan
    AnnTopK.install(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_stale").toString
    val data = s"$tmp/emb"
    Tables.embeddings(spark, sf).limit(200).write.parquet(data)
    val idx = graft.index.IndexStore.path(spark, data, "testlsh", Seq(data))
    graft.index.IndexStore.ensure(spark, idx)(p =>
      LshIndex.build(spark, spark.read.parquet(data), "embedding", "vec_id",
        D, p, Seq("label")))
    IndexedTables.register(spark, data, "embedding", "vec_id", D, idx)
    try {
      val qc = typedlit(hashVectorValues(11L, D))
      def q() = spark.read.parquet(data)
        .orderBy(round(cosineDistance(col("embedding"), qc), 6),
          col("vec_id"))
        .limit(K)
        .select(col("vec_id"),
          round(cosineDistance(col("embedding"), qc), 6).as("score"))
      assert(q().queryExecution.executedPlan.toString.contains("band_idx"))
      // regenerate the table (different row count ⇒ different file
      // lengths ⇒ new fingerprint) — the pinned index is now stale
      spark.read.parquet(data).limit(100).write
        .mode("overwrite").parquet(data)
      spark.catalog.refreshByPath(data)
      val plan = q().queryExecution.executedPlan.toString
      assert(!plan.contains("band_idx"), plan)
      assert(plan.contains("TakeOrderedAndProject"), plan)
    } finally IndexedTables.clear()
  }

  test("registration is session-scoped: a sibling session is untouched") {
    AnnTopK.install(spark)
    IndexedTables.register(spark, s"$sf/embeddings.parquet",
      "embedding", "vec_id", D, Indexes.lshEmb(spark, sf))
    try {
      val s2 = spark.newSession()
      AnnTopK.install(s2)
      val qc = typedlit(hashVectorValues(11L, D))
      val q = s2.read.parquet(s"$sf/embeddings.parquet")
        .orderBy(round(cosineDistance(col("embedding"), qc), 6),
          col("vec_id"))
        .limit(K)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("band_idx"), plan)
      // and the original session still rewrites
      assert(topK().queryExecution.executedPlan.toString
        .contains("band_idx"))
    } finally IndexedTables.clear()
  }

  private def topKL2() = {
    val qc = typedlit(hashVectorValues(11L, D))
    Tables.embeddings(spark, sf)
      .orderBy(round(l2Distance(col("embedding"), qc), 6), col("vec_id"))
      .limit(K)
      .select(col("vec_id"),
        round(l2Distance(col("embedding"), qc), 6).as("score"))
      .orderBy("score", "vec_id")
  }

  test("l2 top-k over an IVF-registered table is served from the cell index") {
    AnnTopK.install(spark)
    IndexedTables.registerIvf(spark, s"$sf/embeddings.parquet",
      "embedding", "vec_id", D, Indexes.ivfEmb(spark, sf),
      graft.knn.Ann.fixedIvfModel(Indexes.IvfCells, D))
    try {
      val q = topKL2()
      val plan = q.queryExecution.executedPlan.toString
      // cell partition probe in the plan, and the scan's float column
      // type restored over the index's double copy
      assert(plan.contains("PartitionFilters: [cell"), plan)
      val a = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = graft.index.IvfIndex.search(spark, Indexes.ivfEmb(spark, sf),
          "embedding", "vec_id", hashVectorValues(11L, D), nprobe = 4, K,
          metric = "l2")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(a == b && a.nonEmpty)
    } finally IndexedTables.clear()
  }

  test("ip top-k over a MIPS-registered table is served from augmented cells") {
    AnnTopK.install(spark)
    IndexedTables.registerMips(spark, s"$sf/embeddings.parquet",
      "embedding", "vec_id", D, Indexes.mipsEmb(spark, sf),
      cells = Indexes.IvfCells)
    try {
      val qc = typedlit(hashVectorValues(11L, D))
      val q = Tables.embeddings(spark, sf)
        .orderBy(round(ipDistance(col("embedding"), qc), 6), col("vec_id"))
        .limit(K)
        .select(col("vec_id"),
          round(ipDistance(col("embedding"), qc), 6).as("score"))
        .orderBy("score", "vec_id")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [cell"), plan)
      // equals the persistent-index probe with the same nprobe
      val a = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = graft.index.MipsIndex.search(spark,
          Indexes.mipsEmb(spark, sf), "embedding", "vec_id",
          hashVectorValues(11L, D), nprobe = 4, k = K)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(a == b && a.nonEmpty)
    } finally IndexedTables.clear()
  }

  test("l2 top-k over an IVF-PQ-registered table probes cells and bounds the pool by ADC") {
    AnnTopK.install(spark)
    IndexedTables.registerIvfPq(spark, s"$sf/embeddings.parquet",
      "embedding", "vec_id", D, Indexes.ivfPqEmb(spark, sf),
      graft.knn.Ann.fixedIvfModel(Indexes.IvfCells, D),
      graft.quant.ProductQuant.fixedCodebooks(D, 8, 16))
    try {
      val q = topKL2()
      val plan = q.queryExecution.executedPlan.toString
      // cell partition probe AND the ADC pool bound in the served plan
      assert(plan.contains("PartitionFilters: [cell"), plan)
      assert(plan.contains("pq_adc_score"), plan)
      // equals the programmatic IVFADC probe with the same knobs
      val a = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = graft.index.IvfPqIndex.search(spark,
          Indexes.ivfPqEmb(spark, sf), "embedding", "vec_id",
          hashVectorValues(11L, D), nprobe = 4, k = K, metric = "l2")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(a == b && a.nonEmpty)
    } finally IndexedTables.clear()
  }

  test("an IVF-PQ registration with rerank below the query LIMIT declines") {
    AnnTopK.install(spark)
    IndexedTables.registerIvfPq(spark, s"$sf/embeddings.parquet",
      "embedding", "vec_id", D, Indexes.ivfPqEmb(spark, sf),
      graft.knn.Ann.fixedIvfModel(Indexes.IvfCells, D),
      graft.quant.ProductQuant.fixedCodebooks(D, 8, 16),
      rerank = K - 1) // pool smaller than the LIMIT → must not serve
    try {
      val q = topKL2()
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("pq_adc_score"), plan)
      assert(q.collect().length == K) // full-scan answer, untruncated
    } finally IndexedTables.clear()
  }

  test("re-registering with a different nprobe is not served from the plan cache") {
    AnnTopK.install(spark)
    def cellsProbed(plan: String): Int =
      "IN \\(([^)]*)\\)".r.findFirstMatchIn(plan)
        .map(_.group(1).split(",").length).getOrElse(0)
    val model = graft.knn.Ann.fixedIvfModel(Indexes.IvfCells, D)
    IndexedTables.registerIvf(spark, s"$sf/embeddings.parquet",
      "embedding", "vec_id", D, Indexes.ivfEmb(spark, sf), model, nprobe = 2)
    val p2 = try topKL2().queryExecution.executedPlan.toString
      finally IndexedTables.clear()
    IndexedTables.registerIvf(spark, s"$sf/embeddings.parquet",
      "embedding", "vec_id", D, Indexes.ivfEmb(spark, sf), model, nprobe = 4)
    val p4 = try topKL2().queryExecution.executedPlan.toString
      finally IndexedTables.clear()
    assert(cellsProbed(p2) == 2, p2)
    assert(cellsProbed(p4) == 4, p4)
  }

  test("metric/kind mismatches decline: cosine needs lsh, l2 needs ivf") {
    AnnTopK.install(spark)
    IndexedTables.registerIvf(spark, s"$sf/embeddings.parquet",
      "embedding", "vec_id", D, Indexes.ivfEmb(spark, sf),
      graft.knn.Ann.fixedIvfModel(Indexes.IvfCells, D))
    try {
      // cosine sort over an ivf registration: untouched exact plan
      val plan = topK().queryExecution.executedPlan.toString
      assert(!plan.contains("band_idx") &&
        !plan.contains("PartitionFilters: [cell"), plan)
    } finally IndexedTables.clear()
    IndexedTables.register(spark, s"$sf/embeddings.parquet",
      "embedding", "vec_id", D, Indexes.lshEmb(spark, sf))
    try {
      // l2 sort over an lsh registration: untouched exact plan
      val plan = topKL2().queryExecution.executedPlan.toString
      assert(!plan.contains("band_idx") &&
        !plan.contains("PartitionFilters: [cell"), plan)
      assert(plan.contains("TakeOrderedAndProject"), plan)
    } finally IndexedTables.clear()
  }

  test("a filter between sort and scan is PUSHED into the bucket probe") {
    AnnTopK.install(spark)
    IndexedTables.register(spark, s"$sf/embeddings.parquet",
      "embedding", "vec_id", D, Indexes.lshEmb(spark, sf))
    try {
      val qc = typedlit(hashVectorValues(11L, D))
      val q = Tables.embeddings(spark, sf)
        .filter(col("label") === 3)
        .orderBy(round(cosineDistance(col("embedding"), qc), 6),
          col("vec_id"))
        .limit(K)
        .select(col("vec_id"),
          round(cosineDistance(col("embedding"), qc), 6).as("score"))
        .orderBy("score", "vec_id")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("band_idx"), plan)
      // the predicate reaches the bucket parquet scan as a pushed filter
      // (filter BEFORE the dedup/rerank = exact filtered top-k), not just
      // as a residual Filter over the candidates
      assert(plan.contains("PushedFilters: [IsNotNull(label), EqualTo(label,3)]") ||
        plan.contains("PushedFilters: [EqualTo(label,3)"), plan)
      val a = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = LshIndex.search(spark, Indexes.lshEmb(spark, sf),
          "embedding", "vec_id", hashVectorValues(11L, D), D, K,
          filter = Some(col("label") === 3))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(a == b && a.nonEmpty)
    } finally IndexedTables.clear()
  }

  test("coexisting registrations serve each metric from its own index") {
    // the ADVICE r5 scenario: lsh + ivf + ivfpq registered for the SAME
    // table (as the sql_ann_topk* catalog entries do) — an l2 sort must
    // probe the EXACT IVF cells (never the rerank-bounded ADC pool) and
    // a cosine sort the LSH bands, independent of registration order
    AnnTopK.install(spark)
    IndexedTables.registerIvf(spark, s"$sf/embeddings.parquet",
      "embedding", "vec_id", D, Indexes.ivfEmb(spark, sf),
      graft.knn.Ann.fixedIvfModel(Indexes.IvfCells, D))
    IndexedTables.registerIvfPq(spark, s"$sf/embeddings.parquet",
      "embedding", "vec_id", D, Indexes.ivfPqEmb(spark, sf),
      graft.knn.Ann.fixedIvfModel(Indexes.IvfCells, D),
      graft.quant.ProductQuant.fixedCodebooks(D, 8, 16))
    IndexedTables.register(spark, s"$sf/embeddings.parquet",
      "embedding", "vec_id", D, Indexes.lshEmb(spark, sf))
    try {
      val l2Plan = topKL2().queryExecution.executedPlan.toString
      assert(l2Plan.contains("PartitionFilters: [cell"), l2Plan)
      assert(!l2Plan.contains("pq_adc_score"), l2Plan)
      val cosPlan = topK().queryExecution.executedPlan.toString
      assert(cosPlan.contains("band_idx"), cosPlan)
    } finally IndexedTables.clear()
  }
}
