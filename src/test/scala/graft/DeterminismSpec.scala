package graft

import org.scalatest.funsuite.AnyFunSuite

/** Results must be identical under different shuffle layouts — the
  * invariant that makes the engine's answers stable across cluster sizes,
  * retries, and AQE decisions (every score is rounded and every LIMIT
  * follows a total order).
  */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private val probes = Seq(
    "knn_batch", "dedup_minhash_lsh", "hybrid_search", "bm25_search",
    "graph_shortest_paths", "events_sessions")

  test("representative queries are invariant to shuffle partition count") {
    val key = "spark.sql.shuffle.partitions"
    val original = spark.conf.get(key)
    def runAll(): Map[String, Seq[String]] =
      probes.map { name =>
        name -> Catalog.byName(name).run(spark, sf)
          .collect().map(_.toString).toSeq
      }.toMap
    try {
      spark.conf.set(key, "5")
      val a = runAll()
      spark.conf.set(key, "17")
      val b = runAll()
      probes.foreach { name =>
        assert(a(name) == b(name), s"$name diverged across partitionings")
      }
    } finally spark.conf.set(key, original)
  }
}
