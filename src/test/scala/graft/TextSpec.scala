package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextAnalysis._

class TextSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fingerprint is order-sensitive and deterministic") {
    val df = Seq(
      (1, "alpha beta gamma"),
      (2, "gamma beta alpha"),
      (3, "alpha beta gamma")).toDF("id", "text")
    val fps = df.select($"id", fingerprint("text").as("fp"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fps(1) == fps(3), "same text must hash equal")
    assert(fps(1) != fps(2), "token order must change the hash")
  }

  test("langId picks the profile with most marker hits, und on none") {
    val df = Seq(
      (1, "the cat of the house is here"),
      (2, "der hund und die katze ist da"),
      (3, "le chat et la maison est ici"),
      (4, "xyzzy qwerty plugh")).toDF("id", "text")
    val got = df.select($"id", langId("text").as("l"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == Map(1 -> "en", 2 -> "de", 3 -> "fr", 4 -> "und"))
  }

  test("quality and stopword ratio behave on edge inputs") {
    val df = Seq((1, "the the the the"), (2, "substantive words only here"))
      .toDF("id", "text")
    val rows = df.select($"id", stopwordRatio("text"), qualityScore("text"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rows(1)._1 == 1.0)
    assert(rows(2)._1 == 0.0)
    assert(rows(1)._2 < rows(2)._2, "all-stopword text scores lower")
  }

  test("naive bayes separates a vocabulary-disjoint corpus exactly") {
    // sources with disjoint vocabularies must classify diagonally: every
    // held-out doc (doc_id % 5 == 0) lands on its own source
    val df = (0 until 10).map(i => (i.toLong, "aa bb aa bb aa", "srcA")) ++
      (10 until 20).map(i => (i.toLong, "cc dd cc dd cc", "srcB"))
    val docs = df.toDF("doc_id", "text", "source")
    val got = graft.text.NaiveBayes.confusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("srcA", "srcA") -> 2L, ("srcB", "srcB") -> 2L))
  }
}
