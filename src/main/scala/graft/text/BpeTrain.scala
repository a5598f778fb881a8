package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning (Sennrich et al. 2016 shape): learn
  * the top-N byte-pair merges over the corpus's word-frequency table.
  *
  * The scale design is the classic two-level factoring: pair statistics
  * are computed over DISTINCT WORDS weighted by word count — the word
  * table is corpus-size-independent (vocabulary-sized), so after the one
  * corpus-wide word count every merge round touches only the vocabulary:
  * one explode of adjacent symbol pairs + one map-side-combined weighted
  * count + a 1-row argmax collect, then the winning merge is applied to
  * the symbol arrays as a single codegen'd fold expression. Driver work
  * per round is one (pair, count) row — bounded regardless of corpus
  * size.
  *
  * Determinism: argmax ties break lexicographically on (left, right), so
  * the learned merge sequence is a pure function of the corpus.
  *
  * Reference scope: fastpyvectordb has no tokenizer training; this is
  * part of the training-data-pipeline extension surface. The catalog row
  * is gated in-engine against [[referenceLearn]], a direct in-memory
  * reimplementation run on the same input.
  */
object BpeTrain {
  final case class Merge(left: String, right: String, count: Long)

  /** The one corpus-scale pass: word → frequency. Public so the
    * verification gate and specs reuse the same aggregation instead of
    * re-running it. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .selectExpr(s"explode(${TextAnalysis.wordTokens(textCol)}) as w")
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Word-frequency table → (w, cnt, s: array of symbols). Tokens come
    * from TextAnalysis.wordTokens, so symbols are \w characters — safe
    * to inline as SQL literals (no quotes/escapes possible). */
  private def symbolTable(words: DataFrame): DataFrame =
    words.selectExpr("w", "cnt",
      "transform(sequence(1, length(w)), gbi -> substring(w, gbi, 1)) as s")

  /** One merge application as a fold over the symbol array: scan left to
    * right, greedily replacing each (left, right) adjacency with the
    * concatenation — the standard BPE apply rule. */
  private def applyMergeExpr(left: String, right: String): String =
    s"""aggregate(
       |  sequence(0, size(s) - 1),
       |  named_struct('out', cast(array() as array<string>), 'skip', false),
       |  (st, gbi) -> case
       |    when st.skip then named_struct('out', st.out, 'skip', false)
       |    when gbi < size(s) - 1 and s[gbi] = '$left' and s[gbi + 1] = '$right'
       |      then named_struct('out', array_append(st.out, '$left$right'),
       |                        'skip', true)
       |    else named_struct('out', array_append(st.out, s[gbi]),
       |                      'skip', false) end,
       |  st -> st.out)""".stripMargin

  /** Learn `iters` merges over the corpus. Each round: weighted pair
    * count over the vocabulary-sized symbol table, 1-row argmax to the
    * driver, fold-apply the winner. */
  def learn(docs: DataFrame, textCol: String, iters: Int): Seq[Merge] =
    learnFromWords(wordCounts(docs, textCol), iters)

  /** Learn from an already-computed word-frequency table (callers that
    * also need the table avoid a second corpus pass). */
  def learnFromWords(words: DataFrame, iters: Int): Seq[Merge] = {
    var syms = symbolTable(words).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rounds = 0
    var exhausted = false
    while (rounds < iters && !exhausted) {
      val top = syms
        .filter(size(col("s")) >= 2)
        .selectExpr("cnt",
          "explode(transform(sequence(0, size(s) - 2), " +
            "gbi -> struct(s[gbi] as l, s[gbi + 1] as r))) as p")
        .groupBy("p.l", "p.r").agg(sum("cnt").as("c"))
        .orderBy(desc("c"), col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += Merge(l, r, c)
        syms = syms
          .selectExpr("w", "cnt", s"${applyMergeExpr(l, r)} as s")
          .localCheckpoint()
        rounds += 1
      }
    }
    merges.toSeq
  }

  /** Driver-side reference implementation (plain Scala, same tie rule) —
    * the verification twin for the in-engine gate. */
  def referenceLearn(words: Map[String, Long], iters: Int): Seq[Merge] = {
    var syms: Map[Vector[String], Long] = words.toSeq
      .map { case (w, c) => w.map(_.toString).toVector -> c }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    for (_ <- 1 to iters) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, c) <- syms; i <- 0 until s.length - 1)
        pairCounts((s(i), s(i + 1))) =
          pairCounts.getOrElse((s(i), s(i + 1)), 0L) + c
      if (pairCounts.nonEmpty) {
        val ((l, r), c) = pairCounts.minBy { case ((a, b), n) => (-n, a, b) }
        out += Merge(l, r, c)
        def apply1(s: Vector[String]): Vector[String] = {
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += s(i); i += 1 }
          }
          b.result()
        }
        syms = syms.toSeq.map { case (s, c2) => apply1(s) -> c2 }
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      }
    }
    out.toSeq
  }
}
