package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump `.explain("formatted")` for catalog queries to files
  * (the r17 optimization-round deliverable: plans/r17/<name>_before.txt
  * and _after.txt, committed so plan-shape claims are checkable without
  * running Spark).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <names_csv>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <sfDir> <outDir> <suffix> <names_csv>")
    val Array(sfDir, outDir, suffix, csv) = args.take(4)
    val names = csv.split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      val q = graft.Catalog.byName(n)
      val plan =
        try q.run(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case scala.util.control.NonFatal(t) => s"explain failed: $t" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
