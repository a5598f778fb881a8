package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan of catalog entries, for
  * plan audits (`Test/runMain graft.ExplainTool name1,name2 [sfDir]`).
  * Not part of the shipped library — test scope only.
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSet
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Catalog.all.filter(q => names.contains(q.name)).foreach { q =>
      println(s"===== ${q.name} =====")
      println(q.run(spark, dir).queryExecution.executedPlan.treeString)
    }
    spark.stop()
  }
}
