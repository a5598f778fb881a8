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

  /** Greedy lowest-rank BPE apply for ONE word: repeatedly find the
    * adjacent symbol pair with the lowest merge rank and merge every
    * occurrence (left-to-right) until no learned pair remains. For a
    * merge list produced by BPE training this yields the identical
    * segmentation to applying the merges in learned order
    * ([[referenceEncodeWord]]) — a symbol can only participate in a
    * merge after the lower-ranked merges that built it — but costs
    * O(passes · len) with passes ≤ len instead of O(|merges| · len),
    * which is what makes 30k-merge vocabularies affordable per word.
    * BpeApplySpec pins the equivalence over learned merges. */
  def encodeWord(w: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = w.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val l = syms.zip(syms.tail).find(p => ranks.get(p).contains(bestRank)).get
        val b = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l._1 && syms(j + 1) == l._2) {
            b += (l._1 + l._2); j += 2
          } else { b += syms(j); j += 1 }
        }
        syms = b.result()
        done = syms.length < 2
      }
    }
    syms
  }

  /** Sequential reference apply — each learned merge applied in order,
    * exactly [[referenceLearn]]'s rewrite rule. Verification twin for
    * [[encodeWord]]. */
  def referenceEncodeWord(w: String, merges: Seq[Merge]): Vector[String] = {
    var syms = w.map(_.toString).toVector
    merges.foreach { m =>
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == m.left && syms(i + 1) == m.right) {
          b += (m.left + m.right); i += 2
        } else { b += syms(i); i += 1 }
      }
      syms = b.result()
    }
    syms
  }

  /** Rank lookup for [[encodeWord]]: merge i has rank i. */
  def ranksOf(merges: Seq[Merge]): Map[(String, String), Int] =
    merges.zipWithIndex.map { case (m, i) => (m.left, m.right) -> i }.toMap

  /** Distributed corpus tokenization with learned merges — the apply
    * half of the tokenizer. Same two-level factoring as [[learn]]: the
    * merge loop runs once per DISTINCT word (a vocabulary-sized
    * mapPartitions with the rank table broadcast), and the corpus-scale
    * work is relational — explode words with positions, hash-join the
    * (word → tokens) table back, reassemble per document in position
    * order. At 100 TB the per-symbol loop cost is O(vocab), not
    * O(corpus); repeated words are encoded exactly once.
    * Returns (idCol, n_words, n_tokens, tokens). */
  def encodeCorpus(docs: DataFrame, textCol: String, merges: Seq[Merge],
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = ranksOf(merges)
    val bc = spark.sparkContext.broadcast(ranks)
    val words = docs.selectExpr(idCol,
      s"posexplode(${TextAnalysis.wordTokens(textCol)}) as (pos, w)")
    val vocab = words.select("w").distinct().as[String]
      .mapPartitions { it =>
        val r = bc.value
        it.map(w => (w, encodeWord(w, r).toSeq))
      }
      .toDF("w", "toks")
    words.join(vocab, "w")
      .groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("pos"), col("toks")))).as("pt"))
      .select(col(idCol), size(col("pt")).as("n_words"),
        flatten(expr("transform(pt, x -> x.toks)")).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
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
