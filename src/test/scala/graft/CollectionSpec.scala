package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.VectorDb
import graft.filter.Eq
import graft.functions.VectorFunctions

/** Lifecycle test of the parquet-backed collection store: create, batch
  * insert (dup rejection), upsert, delete, point lookup, persistence
  * across catalog instances.
  */
class CollectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(ids: (String, Int)*) =
    ids.toSeq.toDF("id", "k")
      .withColumn("vector", VectorFunctions.hashVector(col("k"), 8))
      .withColumn("tag", concat(lit("t"), col("k") % 2))

  test("full CRUD lifecycle with persistence round-trip") {
    val root = Files.createTempDirectory("graft_vdb").toString
    val db = new VectorDb(spark, root)

    val coll = db.createCollection("docs", dimensions = 8)
    assert(db.listCollections() == Seq("docs"))
    assert(coll.count() == 0)

    coll.insertBatch(rows("a" -> 1, "b" -> 2, "c" -> 3))
    assert(coll.count() == 3)

    // duplicate id in a second batch → whole batch rejected
    assertThrows[IllegalArgumentException] {
      coll.insertBatch(rows("c" -> 9, "d" -> 4))
    }
    assert(coll.count() == 3)

    // upsert replaces b, adds d
    coll.upsert(rows("b" -> 20, "d" -> 4))
    assert(coll.count() == 4)
    val bk = coll.get(Seq("b")).select("k").head().getInt(0)
    assert(bk == 20)

    // delete by filter-DSL predicate
    val deleted = coll.deleteWhere(Eq("id", "a"))
    assert(deleted == 1 && coll.count() == 3)

    assert(coll.listIds(limit = 2, offset = 1) == Seq("c", "d"))
    assert(coll.peek(2).select("id").collect().map(_.getString(0)).toSeq
      == Seq("b", "c"))

    // reopen from disk through a fresh catalog
    val db2 = new VectorDb(spark, root)
    val reopened = db2.getCollection("docs").get
    assert(reopened.config.dimensions == 8)
    assert(reopened.count() == 3)

    // deleteIds must not CDC-log ids that never existed
    assert(reopened.deleteIds(Seq("nosuchid")) == 0)

    // CDC changelog recorded every mutation
    val log = reopened.changelog
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(log("insert") == 3L, s"changelog: $log")
    assert(log("upsert") == 2L)
    assert(log("delete") == 1L)

    assert(db2.dropCollection("docs"))
    assert(db2.listCollections().isEmpty)
  }

  test("getWhere retrieves by metadata predicate with reference null semantics") {
    val root = Files.createTempDirectory("graft_vdb").toString
    val db = new VectorDb(spark, root)
    val coll = db.createCollection("gw", dimensions = 8)
    // row "c" is missing the nullable meta field entirely
    coll.insertBatch(
      rows("a" -> 1, "b" -> 2, "c" -> 3)
        .withColumn("grade", when(col("id") =!= "c", col("k") * 10)))

    def ids(p: graft.filter.Pred) =
      coll.getWhere(p).select("id").collect().map(_.getString(0)).sorted.toSeq
    assert(ids(Eq("tag", "t1")) == Seq("a", "c"))
    assert(ids(graft.filter.Gte("grade", 20)) == Seq("b"))
    // reference evaluate(): a missing field fails EVERY leaf — ne/nin
    // require presence-with-a-different-value, so "c" never matches
    assert(ids(graft.filter.Ne("grade", 10)) == Seq("b"))
    assert(ids(graft.filter.Nin("grade", Seq(10, 20))) == Seq())
    // ...but Not(Eq) is two-valued and accepts the missing-field row
    assert(ids(graft.filter.Not(Eq("grade", 10))) == Seq("b", "c"))
  }

  test("upsert rejects intra-batch duplicate ids") {
    val root = Files.createTempDirectory("graft_vdb_dup").toString
    val db = new VectorDb(spark, root)
    val coll = db.createCollection("dups", dimensions = 8)
    coll.insertBatch(rows("a" -> 1))
    assertThrows[IllegalArgumentException] {
      coll.upsert(rows("b" -> 2).unionByName(rows("b" -> 3)))
    }
    assert(coll.count() == 1) // batch rejected atomically
  }

  test("recover() refuses a partial staging dir without _SUCCESS") {
    val root = Files.createTempDirectory("graft_vdb_rec").toString
    val db = new VectorDb(spark, root)
    val coll = db.createCollection("crashy", dimensions = 8)
    // simulate a first-commit crash mid-write: staging has data files but
    // no _SUCCESS marker, and no live/old generation exists
    val staging = java.nio.file.Paths.get(root, "crashy", "data_staging")
    Files.createDirectories(staging)
    Files.write(staging.resolve("part-00000.parquet"), Array[Byte](1, 2, 3))
    assert(coll.isEmpty) // partial staging was NOT promoted
    assert(!Files.exists(staging)) // and was torn down
    // a real insert afterwards works and survives reopen
    coll.insertBatch(rows("a" -> 1))
    assert(coll.count() == 1)
  }

  test("collection-level search honors config metric and pre-score filter") {
    val root = Files.createTempDirectory("graft_vdb_search").toString
    val db = new VectorDb(spark, root)
    val coll = db.getOrCreateCollection("s", dimensions = 8)
    val data = rows("a" -> 1, "b" -> 2, "c" -> 3, "d" -> 4)
      .withColumnRenamed("vector", "vector")
    coll.insertBatch(data)
    val q = VectorFunctions.hashVectorValues(2L, 8)
    val top = coll.search(q, k = 2).collect()
    assert(top.length == 2)
    // b embeds key 2 — it must be its own nearest neighbor
    assert(top.head.getAs[String]("id") == "b")
    // filter BEFORE scoring: restricting to tag t1 excludes b (k=2 even)
    val filtered = coll.search(q, k = 2, Some(Eq("tag", "t1")))
      .select("id").collect().map(_.getString(0)).toSet
    assert(!filtered.contains("b") && filtered.nonEmpty)
    // batch: top-1 per query
    import spark.implicits._
    val qs = Seq((1L, VectorFunctions.hashVectorValues(1L, 8)),
      (3L, VectorFunctions.hashVectorValues(3L, 8))).toDF("query_id", "qvec")
    val batch = coll.searchBatch(qs, k = 1)
      .select("query_id", "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(batch == Map(1L -> "a", 3L -> "c"))
    // getOrCreate returns the existing collection (stored config wins)
    assert(db.getOrCreateCollection("s", dimensions = 99).config.dimensions == 8)
  }

  test("collection names are validated (path + JSON safety)") {
    val root = Files.createTempDirectory("graft_vdb_name").toString
    val db = new VectorDb(spark, root)
    assertThrows[IllegalArgumentException] {
      db.createCollection("""bad"name""", dimensions = 8)
    }
    assertThrows[IllegalArgumentException] {
      db.createCollection("bad/name", dimensions = 8)
    }
  }

  test("compact merges mutation-era files and preserves content") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_vdb_compact").toString
    val db = new VectorDb(spark, root)
    val coll = db.createCollection("c", dimensions = 0, metric = "none")
    // three commits → three file sets in the live generation
    for (b <- 0 until 3)
      coll.insertBatch((0 until 10)
        .map(i => (s"id_${b}_$i", b * 10 + i)).toDF("id", "v"))
    val before = coll.df.orderBy("id").collect().toSeq
    val filesBefore = coll.df.inputFiles.length
    coll.compact(targetFiles = 1)
    assert(coll.df.inputFiles.length == 1)
    assert(coll.df.inputFiles.length < filesBefore)
    assert(coll.df.orderBy("id").collect().toSeq == before)
    assert(coll.count() == 30)
    // point get still works on the compacted layout
    assert(coll.get(Seq("id_1_5")).count() == 1)
    // changelog trim: 3 inserts logged 30 insert events; keep last 10
    val before30 = coll.changelog.count()
    assert(before30 == 30L)
    assert(coll.trimChangelog(10) == 20L)
    assert(coll.changelog.count() == 10L)
    // idempotent when already within budget
    assert(coll.trimChangelog(10) == 0L)
    // reset() drops everything under the root
    db.reset()
    assert(db.listCollections().isEmpty)
  }
}
