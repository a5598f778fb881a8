package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time and/or explain single catalog queries.
  * Usage: runMain graft.Explain <sfDir> <name> [time|plan] [reps]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val name = if (args.length > 1) args(1) else "knn_cosine"
    val mode = if (args.length > 2) args(2) else "plan"
    val reps = if (args.length > 3) args(3).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = Catalog.byName(name)
    if (mode == "plan") q.run(spark, sfDir).explain("formatted")
    else {
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        val n = q.run(spark, sfDir).count()
        println(f"[explain] $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
