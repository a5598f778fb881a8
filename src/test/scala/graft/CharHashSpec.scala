package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Parity pin for the one-pass [[graft.expr.CharHash]] codegen kernel
  * against the SQL-expression fold it replaced
  * (`aggregate(transform(sequence(…), i -> ascii(substring(t,i,1))), …)`)
  * and the driver-side [[graft.embed.HashEmbedder.keyValue]]. The
  * oracled entries only pin the ASCII corpus; this table covers the
  * edges the corpus can't: empty string, single char, long strings, and
  * the agreement domain for multi-byte text (the kernel folds CODE
  * POINTS — DuckDB `ascii(substr)` semantics, which the corpus-level
  * oracles also assume).
  */
class CharHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val e = graft.embed.HashEmbedder(8)

  private def kernel(s: String): Long =
    Seq(s).toDF("text").select(e.textKey("text")).head.getLong(0)
  private def sqlFold(s: String): Long =
    Seq(s).toDF("text")
      .selectExpr(TextAnalysis.charHash("text")).head.getLong(0)

  test("kernel equals the SQL fold and the driver fold on ASCII") {
    val cases = Seq("", "a", "Z9 ~", "hello world",
      "the quick brown fox jumps over the lazy dog " * 40, // ~1.7k chars
      (0 until 500).map(i => ('a' + i % 26).toChar).mkString)
    cases.foreach { s =>
      val k = kernel(s)
      assert(k == sqlFold(s), s"sql fold mismatch for ${s.take(30)}…")
      assert(k == e.keyValue(s), s"driver fold mismatch for ${s.take(30)}…")
    }
  }

  test("kernel folds code points on multi-byte text (DuckDB ascii semantics)") {
    // é U+00E9 (2 bytes), 中 U+4E2D (3 bytes), 😀 U+1F600 (4 bytes —
    // a SUPPLEMENTARY-plane char, i.e. a surrogate PAIR in UTF-16; a
    // code-unit fold would hash 0xD83D,0xDE00 instead of 0x1F600):
    // fold the code points
    val cases = Seq("é" -> Seq(0xe9), "café" -> Seq(0x63, 0x61, 0x66, 0xe9),
      "中文ab" -> Seq(0x4e2d, 0x6587, 0x61, 0x62),
      "a😀b" -> Seq(0x61, 0x1f600, 0x62),
      "😀😀" -> Seq(0x1f600, 0x1f600))
    import TextAnalysis.{CharB, HashM}
    cases.foreach { case (s, cps) =>
      val expect = cps.foldLeft(0L)((a, c) => (a * CharB + c) % HashM)
      assert(kernel(s) == expect, s"codepoint fold for $s")
      // driver-side fold must agree with the kernel beyond the BMP too
      // (ADVICE r9: keyValue used to fold UTF-16 code units)
      assert(e.keyValue(s) == expect, s"driver codepoint fold for $s")
    }
  }

  test("kernel runs inside whole-stage codegen (no interpreted fallback)") {
    // non-foldable input (a literal Seq constant-folds to LocalTableScan)
    val df = spark.range(4).selectExpr("concat('doc', id) as text")
      .select(e.textKey("text").as("k"))
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark whole-stage-codegen'd spans in simpleString
    assert(plan.contains("*(1) Project [graft_charhash"), plan)
    assert(df.collect().map(_.getLong(0)).toSeq ==
      (0 until 4).map(i => e.keyValue(s"doc$i")))
  }
}
