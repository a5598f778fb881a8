package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.BpeTrain

/** BPE merge learning: hand-checked merges on a tiny corpus, equality
  * with the driver-side reference, and the greedy left-to-right apply
  * rule (no overlapping re-merge within one pass). */
class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("learns the hand-computed merges with lexicographic tie-breaks") {
    import spark.implicits._
    // "low low lower": pairs lo×3, ow×3, we×1, er×1 → tie lo/ow breaks
    // to 'lo'; then (lo,w)×3 wins → 'low'; then (low,e)×1 vs (e,r)×1 →
    // lexicographic: ('e','r') < ('low','e')
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val m = BpeTrain.learn(docs, "text", 3)
    assert(m.map(x => (x.left, x.right, x.count)) ==
      Seq(("l", "o", 3L), ("lo", "w", 3L), ("e", "r", 1L)))
  }

  test("distributed learning equals the reference implementation") {
    val docs = graft.core.Tables.documents(spark, SparkTestSession.sf)
      .limit(60).cache()
    val wordsDf = BpeTrain.wordCounts(docs, "text").localCheckpoint()
    val learned = BpeTrain.learnFromWords(wordsDf, 6)
    val words = wordsDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(learned == BpeTrain.referenceLearn(words, 6) && learned.size == 6)
  }

  test("greedy apply does not re-merge across a fresh merge boundary") {
    import spark.implicits._
    // "aaa": pairs (a,a)×2 → merge 'aa'; greedy scan of a,a,a yields
    // [aa, a] (the middle symbol is consumed, not shared)
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val m = BpeTrain.learn(docs, "text", 1)
    assert(m.head == BpeTrain.Merge("a", "a", 4L))
    val ref = BpeTrain.referenceLearn(Map("aaa" -> 2L), 1)
    assert(ref.head == BpeTrain.Merge("a", "a", 4L))
  }
}
