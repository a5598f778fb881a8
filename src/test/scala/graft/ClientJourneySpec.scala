package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.VectorDb
import graft.embed.HashEmbedder
import graft.filter.Eq
import graft.knn.Knn

/** The reference's primary user journey (tests/test_client.py): create a
  * collection, add documents with auto-embedding, query by text with a
  * metadata filter, update a document (re-embed), delete by filter —
  * all against the deterministic embedder.
  */
class ClientJourneySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val e = HashEmbedder(16)

  private def embed(rows: (String, String, String)*) =
    rows.toSeq.toDF("id", "text", "topic")
      .withColumn("vector", e.embed("text"))

  test("text collection lifecycle: add, query, filtered query, update, delete") {
    val root = Files.createTempDirectory("graft_client").toString
    val db = new VectorDb(spark, root)
    val coll = db.createCollection("texts", dimensions = 16)

    coll.insertBatch(embed(
      ("d1", "spark shuffles data between stages", "engines"),
      ("d2", "cats purr when they are content", "animals"),
      ("d3", "catalyst optimizes logical plans", "engines"),
      ("d4", "dogs bark at the mail carrier", "animals")))

    // text query: the exact same text must come back at distance 0
    def search(text: String, k: Int, filter: Option[graft.filter.Pred] = None) =
      Knn.search(coll.df, col("vector"), typedlit(e.embedValue(text)),
        "cosine", k, filter.map(_.column), idCol = "id")
        .select("id", "score").collect().map(r => (r.getString(0), r.getDouble(1)))

    val hits = search("cats purr when they are content", 2)
    assert(hits.head == ("d2", 0.0), s"exact text must rank first: ${hits.toSeq}")

    // filtered query restricts the candidate set before scoring
    val filtered = search("cats purr when they are content", 2,
      Some(Eq("topic", "engines")))
    assert(filtered.map(_._1).toSet.subsetOf(Set("d1", "d3")))

    // update = upsert with re-embedded text; the old text no longer hits 0
    coll.upsert(embed(("d2", "completely different content now", "animals")))
    val after = search("cats purr when they are content", 1)
    assert(after.head._2 > 0.0, "stale embedding must be gone after upsert")
    assert(search("completely different content now", 1).head == ("d2", 0.0))

    // delete by metadata filter (d2 and d4 both carry topic=animals)
    assert(coll.deleteWhere(Eq("topic", "animals")) == 2)
    assert(coll.count() == 2)

    db.dropCollection("texts")
  }
}
