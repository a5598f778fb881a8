package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.embed.{CachedEmbedder, Embedders, HashEmbedder}

class EmbedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val e = HashEmbedder(8)

  test("engine-side and driver-side embeddings agree") {
    val df = Seq((1, "hello world"), (2, "spark engine")).toDF("id", "text")
    val engine = df.select($"id", e.embed("text").as("v"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(engine(1) == e.embedValue("hello world"))
    assert(engine(2) == e.embedValue("spark engine"))
    assert(engine(1) != engine(2))
  }

  test("cached embedding reuses hits and embeds only misses") {
    val docs = Seq((1, "aaa"), (2, "bbb"), (3, "ccc")).toDF("id", "text")
    val cached = Seq((e.keyValue("aaa"), Seq(9.0, 9.0))).toDF("key", "vector")
    val out = CachedEmbedder.embedWithCache(docs, cached, e)
      .collect().map(r => r.getInt(0) ->
        (r.getSeq[Double](2), r.getBoolean(3))).toMap
    assert(out(1)._2 && out(1)._1 == Seq(9.0, 9.0), "hit keeps cached vector")
    assert(!out(2)._2 && out(2)._1 == e.embedValue("bbb"))
    assert(!out(3)._2 && out(3)._1 == e.embedValue("ccc"))
  }

  test("get_embedder factory resolves providers") {
    assert(Embedders.get("auto", 32).dimensions == 32)
    assert(Embedders.get("hash", 16).modelName == "graft-hash")
    assertThrows[UnsupportedOperationException](Embedders.get("openai"))
    assertThrows[IllegalArgumentException](Embedders.get("nope"))
  }
}
