package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic Parquet testdata (TESTDATA.md).
  * Each table is one parquet file under the scale-factor directory; at
  * cluster scale these would be partitioned directories — the reader call
  * is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) (which Spark
    * only reads as long via the legacy conf) and as TIMESTAMP(MICROS)
    * without UTC adjustment (read natively as TIMESTAMP_NTZ) across
    * testdata generations — normalize either to session TIMESTAMP
    * (session tz is pinned UTC by every entrypoint, so the NTZ cast is
    * value-identical). The conf is set defensively per-call because the
    * driver smoke-test supplies its own SparkSession.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(s, d, "events"))
  }

  /** Coerce an on-disk `ts` column (raw nanos long | TIMESTAMP_NTZ |
    * TIMESTAMP) to session-tz TIMESTAMP at micro precision. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Embedding dimension of the testdata `embeddings.embedding` column. */
  val EmbeddingDim = 64
}

/** Schema guards shared by the typed kernels. */
object Ids {
  /** The IVF/PQ mapPartitions kernels cast the id to long; a non-integral
    * id column would become all-null silently — reject it up front. */
  def requireIntegral(df: org.apache.spark.sql.DataFrame, idCol: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(idCol).dataType
    require(dt == LongType || dt == IntegerType || dt == ShortType,
      s"'$idCol' must be an integral id column for the typed kernels " +
        s"(got $dt); map string ids to a surrogate key first")
  }
}
