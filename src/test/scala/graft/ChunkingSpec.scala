package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Chunking

/** Chunking.chunk: window/stride coverage, overlap, final partial
  * window, tokenless-doc drop, and parameter validation. */
class ChunkingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("windows cover every token with the configured overlap") {
    val d = docs((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
    val out = Chunking.chunk(d, "text", "doc_id", window = 4, stride = 3)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    // starts 0,3,6,9 → windows of 4, final partial of 1
    assert(out.toSeq == Seq(
      (0, 4, "t1 t2 t3 t4"),
      (1, 4, "t4 t5 t6 t7"),
      (2, 4, "t7 t8 t9 t10"),
      (3, 1, "t10")))
  }

  test("a doc shorter than the window yields one whole-doc chunk") {
    val out = Chunking.chunk(docs((1L, "a b c")), "text", "doc_id", 32, 24)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.toSeq == Seq((0, 3, "a b c")))
  }

  test("tokenless docs are dropped, not emitted as empty chunks") {
    val out = Chunking.chunk(docs((1L, "!!! ..."), (2L, "ok then")),
      "text", "doc_id", 8, 8).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("stride > window is rejected") {
    intercept[IllegalArgumentException] {
      Chunking.chunk(docs((1L, "a b")), "text", "doc_id", 4, 5)
    }
  }
}
