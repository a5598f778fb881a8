package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (VERDICT r13 #5): re-measure one catalog entry at the
  * fingerprint-keyed 10× decade corpus with the bench's exact
  * discipline — cold (pays the at-scale index/graph builds), settle,
  * then N timed reps — plus the synthetic calibration probe before and
  * after, so a quiet-box number can be pinned against the driver's
  * co-tenant-stressed draw. Also times 3 base-scale warm reps for the
  * decade ratio.
  *
  * Usage: runMain graft.tools.ProbeDecade <entry> [sfDir] [reps]
  * (the 10× corpus must already exist — any bench run builds it;
  * bench_full.json's scale_decade.dir names it)
  */
object ProbeDecade {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val nReps = if (args.length > 2) args(2).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fp = graft.index.IndexStore.fingerprint(spark,
      graft.ScaleUp.tables.map(t => s"$sfDir/$t.parquet"))
    val dDir = s"${graft.index.IndexStore.root}/_scale10x/" +
      s"${graft.index.IndexStore.slug(sfDir)}/x10_$fp"
    require(new java.io.File(dDir).isDirectory,
      s"10x corpus missing: $dDir — run the bench once to build it")
    val q = graft.Catalog.byName(name)
    // same synthetic calibration job as Bench.measureProbe: a box-load
    // number next to every measurement
    def calib(): Double = {
      def one(): Double = {
        val t0 = System.nanoTime()
        spark.range(1L << 24)
          .selectExpr("sum((id % 65536) * (id % 65537))").collect()
        (System.nanoTime() - t0) / 1e9
      }
      val xs = Seq.fill(3)(one()).sorted; xs(1)
    }
    def rep(dir: String, tag: String): Double = {
      val t0 = System.nanoTime()
      q.run(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      System.gc()
      println(f"[probe] $tag%-9s $dt%8.3f s")
      dt
    }
    println(f"[probe] calib_before ${calib()}%.3f s  (corpus: $dDir)")
    rep(sfDir, "base_cold"); rep(sfDir, "base_set")
    val base = (1 to 3).map(i => rep(sfDir, s"base$i"))
    val baseW = base.sorted.apply(base.size / 2)
    rep(dDir, "cold"); rep(dDir, "settle")
    val ws = (1 to nReps).map(i => rep(dDir, s"warm$i"))
    val med = ws.sorted.apply(ws.size / 2)
    println(f"[probe] calib_after  ${calib()}%.3f s")
    println(f"[probe] $name%s base_warm=$baseW%.3f 10x_median=$med%.3f " +
      f"10x_min=${ws.min}%.3f ratio_median=${med / baseW}%.3f " +
      f"ratio_min=${ws.min / baseW}%.3f")
    spark.stop()
  }
}
