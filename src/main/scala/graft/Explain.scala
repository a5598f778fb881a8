package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Catalog.byName("knn_cosine").run(spark, "/root/testdata/sf0.001").explain("formatted")
    spark.stop()
  }
}
