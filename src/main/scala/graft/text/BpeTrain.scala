package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning (Sennrich et al. 2016 shape): learn
  * the top-N byte-pair merges over the corpus's word-frequency table.
  *
  * The scale design is the classic two-level factoring: pair statistics
  * live on DISTINCT WORDS weighted by word count, and the word table is
  * corpus-size-independent (vocabulary-sized). So the CORPUS-scale work
  * is exactly one Spark job — the word count — and the merge loop runs
  * driver-side over the collected vocabulary ([[driverLearn]], an
  * incremental pair-index learner). The earlier design ran one
  * distributed pair-stats job + 1-row argmax collect PER merge round:
  * the right per-round shape, but a real tokenizer needs ~30k merges and
  * 30k driver round-trips swamp the (vocabulary-sized!) per-round
  * compute. Two jobs total beats 30 000.
  *
  * Memory bound: the collected table is capped at `maxVocab` distinct
  * words, kept by (count desc, word) — deterministic, and at any
  * realistic cap the dropped tail is hapax noise that carries negligible
  * pair mass.
  *
  * Determinism: argmax ties break lexicographically on (left, right), so
  * the learned merge sequence is a pure function of the corpus.
  *
  * Reference scope: fastpyvectordb has no tokenizer training; this is
  * part of the training-data-pipeline extension surface. The catalog row
  * is gated in-engine against [[referenceLearn]], a direct in-memory
  * reimplementation run on the same input; BpeTrainSpec additionally
  * pins [[driverLearn]] ≡ [[referenceLearn]] for 150-merge runs.
  */
object BpeTrain {
  final case class Merge(left: String, right: String, count: Long)

  /** Default cap on the collected vocabulary (distinct words). */
  val DefaultMaxVocab: Int = 2000000

  /** The one corpus-scale pass: word → frequency. Public so the
    * verification gate and specs reuse the same aggregation instead of
    * re-running it. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .selectExpr(s"explode(${TextAnalysis.wordTokens(textCol)}) as w")
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Learn `iters` merges over the corpus: one distributed word-count
    * job, then the driver-side merge loop over the bounded vocabulary. */
  def learn(docs: DataFrame, textCol: String, iters: Int): Seq[Merge] =
    learnFromWords(wordCounts(docs, textCol), iters)

  /** Learn from an already-computed word-frequency table (callers that
    * also need the table avoid a second corpus pass). ONE collect job
    * (top-`maxVocab` words by (cnt desc, w)), then [[driverLearn]]. */
  def learnFromWords(words: DataFrame, iters: Int,
      maxVocab: Int = DefaultMaxVocab): Seq[Merge] = {
    val collected = words
      .orderBy(desc("cnt"), col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    driverLearn(collected, iters)
  }

  /** The merge loop: incremental pair-index BPE over the collected
    * word-frequency table. Keeps (a) weighted adjacent-pair counts and
    * (b) an inverted pair → word-ids index; each round picks the argmax
    * (count desc, then (left, right) asc — [[referenceLearn]]'s exact
    * tie rule) and rewrites ONLY the words containing the winning pair,
    * adjusting both structures by the local delta. Per round that is
    * O(#affected words · word length) + an O(#distinct pairs) argmax
    * scan — no quadratic recount, so tokenizer-scale merge counts (tens
    * of thousands) are driver-cheap. Produces the identical merge
    * sequence to [[referenceLearn]] (BpeTrainSpec pins it). */
  def driverLearn(words: Map[String, Long], iters: Int): Seq[Merge] = {
    import scala.collection.mutable
    val syms = mutable.ArrayBuffer.empty[Array[String]]
    val cnts = mutable.ArrayBuffer.empty[Long]
    words.foreach { case (w, c) =>
      syms += w.map(_.toString).toArray; cnts += c
    }
    def pairsOf(s: Array[String]): Iterator[(String, String)] =
      (0 until s.length - 1).iterator.map(i => (s(i), s(i + 1)))
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    for (i <- syms.indices; p <- pairsOf(syms(i))) {
      pairCounts(p) = pairCounts.getOrElse(p, 0L) + cnts(i)
      pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
    }
    val out = mutable.ArrayBuffer.empty[Merge]
    var rounds = 0
    while (rounds < iters && pairCounts.nonEmpty) {
      val ((l, r), c) = pairCounts.minBy { case ((a, b), n) => (-n, a, b) }
      out += Merge(l, r, c)
      val affected = pairWords.getOrElse((l, r), mutable.Set.empty).toArray
      affected.foreach { i =>
        val old = syms(i)
        val b = Array.newBuilder[String]
        var j = 0
        while (j < old.length) {
          if (j < old.length - 1 && old(j) == l && old(j + 1) == r) {
            b += (l + r); j += 2
          } else { b += old(j); j += 1 }
        }
        val neu = b.result()
        val cw = cnts(i)
        pairsOf(old).foreach { p =>
          val n = pairCounts(p) - cw
          if (n <= 0L) { pairCounts -= p; pairWords -= p }
          else pairCounts(p) = n
        }
        // membership rebuild: a pair removed above may reappear in `neu`
        pairsOf(old).foreach(p => pairWords.get(p).foreach(_ -= i))
        pairsOf(neu).foreach { p =>
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + cw
          pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
        }
        syms(i) = neu
      }
      rounds += 1
    }
    out.toSeq
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
