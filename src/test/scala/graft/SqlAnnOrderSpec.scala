package graft

import org.scalatest.funsuite.AnyFunSuite

/** Order-independence of the declarative ANN catalog entries (VERDICT r7
  * #2): the five sql_ann_topk* queries register index serving paths for
  * the SAME embeddings table — lsh (cosine), ivf + ivfpq (l2), mips (ip)
  * — and `sql_ann_topk_pq` needs the IVF-PQ serving of an l2 sort even
  * when the exact-IVF registration is armed on the session. It scopes
  * that choice with a child session (registrations are keyed by session
  * UUID), so no entry mutates state another entry's planning can
  * observe. This spec pins that: every permutation of the family yields
  * identical row sets, and the _pq entry's plan carries the ADC pool
  * bound regardless of whether _l2 armed the exact IVF entry before or
  * after it.
  */
class SqlAnnOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private val family = Seq("sql_ann_topk", "sql_ann_topk_filtered",
    "sql_ann_topk_l2", "sql_ann_topk_pq", "sql_ann_topk_ip")

  private def runAll(order: Seq[String]): Map[String, Seq[String]] =
    order.map { n =>
      n -> Catalog.byName(n).run(spark, sf).collect().map(_.toString).toSeq
    }.toMap

  test("every family permutation returns identical results") {
    // catalog order first (the Verify order), then the adversarial
    // orders: _pq planned BETWEEN _l2's registration and its collection,
    // and _pq first (no prior registrations at all)
    val orders = Seq(
      family,
      Seq("sql_ann_topk_l2", "sql_ann_topk_pq", "sql_ann_topk",
        "sql_ann_topk_ip", "sql_ann_topk_filtered"),
      Seq("sql_ann_topk_pq", "sql_ann_topk_ip", "sql_ann_topk_l2",
        "sql_ann_topk_filtered", "sql_ann_topk"))
    val results = orders.map(runAll)
    for (o <- results.tail; n <- family)
      assert(o(n) == results.head(n), s"$n differs across run orders")
    assert(family.forall(n => results.head(n).nonEmpty))
  }

  test("_pq serves from IVF-PQ even with the exact-IVF entry armed") {
    // arm the exact IVF registration the way sql_ann_topk_l2 leaves the
    // session, then plan _pq: its DataFrame must still carry the ADC
    // pool bound (child-session scoping), and INTERLEAVED planning —
    // collecting an l2 query on the parent session while _pq's lazy
    // frame is alive — must keep serving the exact IVF probe there
    Catalog.byName("sql_ann_topk_l2").run(spark, sf).collect()
    val pq = Catalog.byName("sql_ann_topk_pq").run(spark, sf)
    val pqPlan = pq.queryExecution.executedPlan.toString
    assert(pqPlan.contains("pq_adc_score"), pqPlan.take(3000))
    val l2 = Catalog.byName("sql_ann_topk_l2").run(spark, sf)
    val l2Plan = l2.queryExecution.executedPlan.toString
    assert(l2Plan.contains("PartitionFilters: [cell"), l2Plan.take(3000))
    assert(!l2Plan.contains("pq_adc_score"), l2Plan.take(3000))
    // and a FRESH QueryExecution of the _pq frame (what a write would
    // derive) still resolves to the IVF-PQ serving — the former
    // collect-and-reparallelize pinning is no longer needed
    assert(pq.filter("vec_id is not null").queryExecution.executedPlan
      .toString.contains("pq_adc_score"))
    assert(pq.collect().nonEmpty && l2.collect().nonEmpty)
  }

  test("repeated _pq invocations reuse ONE child session (no registry growth)") {
    // the child session is memoized per (parent session, dir): bench
    // reps and long-lived serving sessions must not leak one session
    // UUID + registration per call (post-review fix, round 8)
    Catalog.byName("sql_ann_topk_pq").run(spark, sf).collect()
    val after1 = graft.plans.IndexedTables.size
    (1 to 3).foreach { _ =>
      Catalog.byName("sql_ann_topk_pq").run(spark, sf).collect()
    }
    assert(graft.plans.IndexedTables.size == after1,
      "each _pq invocation grew the shared registry — child session not memoized")
  }
}
