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

  test("tokenizer-scale merge counts: 150 incremental merges equal the reference") {
    // the incremental pair-index learner must track the naive
    // recount-everything twin merge-for-merge deep into the sequence,
    // where stale-index bugs (a pair re-forming after its count was
    // zeroed, double-subtracted overlaps like 'aaa') would surface.
    // The testdata corpus's ~40-word vocabulary exhausts after ~90
    // merges, so use a hash-derived corpus with enough distinct words
    // that 150 merges don't run dry.
    val docs = spark.range(300).selectExpr("id as doc_id",
      "substring(md5(cast(id as string)), 1, 8) as text")
    val wordsDf = BpeTrain.wordCounts(docs, "text").localCheckpoint()
    val learned = BpeTrain.learnFromWords(wordsDf, 150)
    val words = wordsDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = BpeTrain.referenceLearn(words, 150)
    assert(learned.size == 150, s"expected 150 merges, got ${learned.size}")
    learned.zip(ref).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"divergence at merge $i: $a vs $b")
    }
  }

  test("vocab cap keeps the highest-count words deterministically") {
    import spark.implicits._
    // cap=2 keeps {bb (3), aa (2)} — dropping 'zz' changes learnable
    // pair mass, and the kept merges must match the reference run on
    // exactly the capped table
    val docs = Seq((1L, "aa aa bb bb bb zz")).toDF("doc_id", "text")
    val wordsDf = BpeTrain.wordCounts(docs, "text")
    val learned = BpeTrain.learnFromWords(wordsDf, 2, maxVocab = 2)
    assert(learned == BpeTrain.referenceLearn(Map("bb" -> 3L, "aa" -> 2L), 2))
  }

  test("encodeWord: greedy lowest-rank equals the sequential reference apply") {
    // on a merge list produced by training, picking the lowest-rank
    // present pair must reproduce the apply-in-learned-order
    // segmentation for every vocabulary word — and concatenating the
    // tokens must rebuild the word exactly (lossless)
    val docs = graft.core.Tables.documents(spark, SparkTestSession.sf)
      .limit(100).cache()
    val wordsDf = BpeTrain.wordCounts(docs, "text").localCheckpoint()
    val merges = BpeTrain.learnFromWords(wordsDf, 60)
    val ranks = BpeTrain.ranksOf(merges)
    wordsDf.collect().map(_.getString(0)).foreach { w =>
      val got = BpeTrain.encodeWord(w, ranks)
      assert(got.toVector == BpeTrain.referenceEncodeWord(w, merges),
        s"greedy/sequential divergence on '$w'")
      assert(got.mkString == w, s"lossy segmentation of '$w'")
    }
  }

  test("encodeCorpus: distributed tokens are position-ordered and lossless") {
    import spark.implicits._
    val docs = Seq((1L, "low low lower"), (2L, "lower low"), (3L, ""))
      .toDF("doc_id", "text")
    val merges = BpeTrain.learn(docs, "text", 3) // (l,o), (lo,w), (e,r)
    val out = BpeTrain.encodeCorpus(docs, "text", merges).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getSeq[String](r.fieldIndex("tokens"))).toMap
    assert(out(1L) == Seq("low", "low", "low", "er"))
    assert(out(2L) == Seq("low", "er", "low"))
    assert(!out.contains(3L), "a doc with no word tokens produces no row")
  }

  test("encodeCorpus: random corpora match per-word reference encoding") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // random words over a 3-letter alphabet force dense merge collisions
    for (trial <- 1 to 2) {
      val d = (1 to 40).map { id =>
        val words = Seq.fill(1 + rnd.nextInt(6))(
          Seq.fill(1 + rnd.nextInt(8))("abc" (rnd.nextInt(3))).mkString)
        (id.toLong, words.mkString(" "))
      }
      val docs = d.toDF("doc_id", "text")
      val merges = BpeTrain.learn(docs, "text", 25)
      val got = BpeTrain.encodeCorpus(docs, "text", merges).collect()
        .map(r => r.getLong(r.fieldIndex("doc_id")) ->
          r.getSeq[String](r.fieldIndex("tokens"))).toMap
      d.foreach { case (id, text) =>
        val expect = text.split(" ").filter(_.nonEmpty).toSeq
          .flatMap(w => BpeTrain.referenceEncodeWord(w, merges))
        assert(got(id) == expect, s"trial $trial doc $id")
      }
    }
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
