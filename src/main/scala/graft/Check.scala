package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump selected catalog queries + oracles for a local DuckDB
  * compare (the driver's correctness gate, scoped to named queries).
  * Usage: runMain graft.Check <sfDir> <outDir> <name> [<name> ...]
  */
object Check {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val q = Catalog.byName(n)
      q.run(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$n")
      q.oracle.foreach(sql => java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$n.sql"), sql))
      println(s"[check] dumped $n")
    }
    spark.stop()
  }
}
