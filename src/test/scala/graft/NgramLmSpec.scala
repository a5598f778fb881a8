package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.NgramLm

/** Bigram LM: bigram extraction shape, smoothed probability values on a
  * hand-checkable corpus, and the scoring invariants (repetitive text
  * scores lower NLL than novel text; ppl = exp(nll)). */
class NgramLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bigrams are adjacent token pairs; short docs drop out") {
    import spark.implicits._
    val d = docs(1L -> "a b c", 2L -> "solo", 3L -> "")
    val got = NgramLm.bigrams(d).as[(Long, String, String)].collect().sorted
    assert(got.toSeq == Seq((1L, "a", "b"), (1L, "b", "c")))
  }

  test("smoothed conditional probability matches the hand formula") {
    // corpus: "a b a b" → bigrams (a,b),(b,a),(a,b); V = 2
    // c(a,b)=2, c(a,·)=2 → P(b|a) = (2+0.5)/(2+0.5·2) = 2.5/3
    val d = docs(1L -> "a b a b")
    val big = NgramLm.bigrams(d)
    val m = NgramLm.model(big, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m(("a", "b")) == (2L, 2L, 2L))
    assert(m(("b", "a")) == (1L, 1L, 2L))
    val row = NgramLm.score(d).collect().head
    // NLL = -(2·ln(2.5/3) + ln(1.5/2))/3 in micro-nat-exact units
    val lp = (t: Double) => math.round(math.log(t) * 1e6)
    val expected = -(2 * lp(2.5 / 3) + lp(1.5 / 2)) / 1e6 / 3
    assert(row.getAs[Long]("n_bigrams") == 3L)
    assert(math.abs(row.getAs[Double]("nll") -
      BigDecimal(expected).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
  }

  test("repetitive text scores lower NLL than novel text; ppl = exp(nll)") {
    val d = docs(
      1L -> "the cat sat the cat sat the cat sat",
      2L -> "quux zorp flib wibble snork blat")
    val rows = NgramLm.score(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Double]("nll") < rows(2L).getAs[Double]("nll"))
    rows.values.foreach { r =>
      val nll = r.getAs[Double]("nll")
      assert(math.abs(r.getAs[Double]("ppl") - math.exp(nll)) < 1e-3)
    }
  }
}
