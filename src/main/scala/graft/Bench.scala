package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with the warm (steady-state)
  * headline total as the primary metric, plus the cold pass and the
  * index/graph build phase timed separately — the reference's own
  * benchmarks time searches against an already-built index, never index
  * construction per query (`hybrid_search.py:77-117`).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/scheduler once (session init, codegen compiler, shuffle
    // machinery) so the build phase isn't charged for it.
    try {
      spark.range(1 << 18).selectExpr("sum(id)").collect()
      SparkEntry.entry(spark).count()
    } catch { case _: Throwable => () }
    // ---- build phase, timed separately: persistent retrieval indexes
    // (force-rebuilt so the cost is real, not a cache hit from a prior
    // run) and the derived graph with BOTH relations materialized.
    val tb = System.nanoTime()
    val buildFailed =
      try {
        index.Indexes.invalidateAll(spark, sfDir)
        index.Indexes.buildAll(spark, sfDir)
        val g = graph.TpchGraph.build(spark, sfDir)
        g.edges.count(); g.nodes.count()
        false
      } catch { case t: Throwable =>
        System.err.println(s"[bench] build phase failed: $t"); true
      }
    val buildSec = (System.nanoTime() - tb) / 1e9
    // ---- headline queries (Q.bench flag), in stable catalog order, each
    // run 4 times: rep 1 pays per-plan codegen/compilation (reported as
    // cold, EXCLUDED from the warm metric), and warm is the MEDIAN of the
    // 3 remaining steady-state reps — so neither the cold rep nor a
    // one-off GC/JIT spike can dominate the headline. A failed rep is
    // recorded in `failed` and excluded from the totals instead of
    // contributing a bogus near-zero duration.
    val WarmReps = 3
    val results = Catalog.all.filter(_.bench).map { q =>
      def rep(): Option[Double] = {
        val t0 = System.nanoTime()
        try { q.run(spark, sfDir).count() } catch {
          case t: Throwable =>
            System.err.println(s"[bench] ${q.name} failed: $t"); return None
        }
        Some((System.nanoTime() - t0) / 1e9)
      }
      val cold = rep()
      val warmReps = Seq.fill(WarmReps)(rep()).flatten
      val warm =
        if (cold.isDefined && warmReps.size == WarmReps)
          Some(warmReps.sorted.apply(WarmReps / 2))
        else None
      // Release the query's dead GC-scoped state before the next one is
      // timed: localCheckpoint blocks are freed by the ContextCleaner only
      // after the owning DataFrames are collected, so without an explicit
      // GC a long catalog accumulates dead blocks and later queries get
      // billed for the resulting memory pressure. LIVE state (the built
      // graph's persisted nodes/edges, index readers) is object-held and
      // survives — do NOT clearCache() here, that would unpersist the
      // build phase's materializations and re-bill them to every
      // subsequent graph query.
      System.gc()
      (q.name, cold, warm)
    }
    // Round to ms so the line stays compact, and make the JSON the very
    // LAST stdout line of the process: stop Spark (and its shutdown
    // logging) BEFORE printing, so a fixed-size tail of the log always
    // contains the whole line — the driver parses the final line.
    def r3(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def jmap(vs: Seq[(String, Double)]): String =
      vs.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val good = results.collect { case (n, c, Some(w)) => (n, c.getOrElse(w), w) }
    val failed = results.collect { case (n, _, None) => "\"" + n + "\"" }
    val warmTotal = good.map(_._3).sum
    val coldTotal = good.map(_._2).sum
    // The driver captures only a fixed-size tail of stdout, so the final
    // line must stay compact: totals + the 10 slowest warm queries. The
    // complete per-query cold/warm maps go to bench_full.json alongside
    // the repo for human inspection.
    val fullJson = s"""{"metric":"total","value":${r3(warmTotal)},"unit":"sec"""" +
      s""","queries":${jmap(good.map(r => r._1 -> r._3))}""" +
      s""","queries_cold":${jmap(good.map(r => r._1 -> r._2))}""" +
      s""","cold_total":${r3(coldTotal)},"build_sec":${r3(buildSec)}""" +
      s""","build_failed":$buildFailed""" +
      s""","failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_full.json"),
      fullJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case t: Throwable => System.err.println(s"[bench] bench_full.json write failed: $t") }
    val slowest = good.sortBy(-_._3).take(10)
    val json = s"""{"metric":"total","value":${r3(warmTotal)},"unit":"sec"""" +
      s""","queries":${jmap(slowest.map(r => r._1 -> r._3))}""" +
      s""","cold_total":${r3(coldTotal)},"build_sec":${r3(buildSec)}""" +
      s""","build_failed":$buildFailed,"n_queries":${good.size}""" +
      s""","failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}"""
    spark.stop()
    println(json)
    System.out.flush()
  }
}
