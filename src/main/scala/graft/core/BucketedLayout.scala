package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pre-shuffled bucketed table layout — the storage-side answer to the
  * repeated fact⋈fact join. A 100 TB lineitem⋈orders join shuffles both
  * sides on the order key EVERY time it runs; bucketing both tables by
  * that key at WRITE time pays the shuffle once, at layout time, and
  * every later join plans exchange-free (Spark reads matching buckets
  * co-located — `SelectedBucketsCount` in the scan, no `Exchange` under
  * the `SortMergeJoin`). The reference is single-node and has no notion
  * of data layout; this is a Spark-first extension, the same build-once/
  * join-many contract as the persistent retrieval indexes in
  * [[graft.index.IndexStore]].
  *
  * Layout artifacts are EXTERNAL tables under the index store root
  * (never inside the read-only testdata dirs), memoized per session via
  * the catalog: the first call per session writes (or re-registers) the
  * bucketed copies; later calls — bench reps, repeated queries — reuse
  * them. 8 buckets matches the local test corpus; at cluster scale the
  * bucket count is sized so one bucket ≈ one task's worth of data
  * (e.g. ~2k buckets for a 100 TB fact at 512 MB/bucket-file-split).
  */
object BucketedLayout {
  val Buckets = 8

  private def dirSlug(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]", "_")

  private def tableName(base: String, dir: String, fp: String): String =
    s"graft_bj_${base}_${dirSlug(dir)}_$fp"

  private def layoutRoot(dir: String): String =
    s"${graft.index.IndexStore.root}/_bucketed/" +
      graft.index.IndexStore.slug(dir)

  /** Ensure the bucketed `orders`/`lineitem` copies for `dir` exist and
    * are registered in this session's catalog; returns their table
    * names. Table name and path are keyed by the SOURCE FINGERPRINT
    * (same auto-fresh contract as [[graft.index.IndexStore]] and
    * [[PartitionedLayout]]): a regenerated source changes the
    * fingerprint, so the memo misses and the layout rebuilds — stale
    * same-base registrations are dropped and their files deleted.
    * The source frames are by-name so the memoized hit never pays the
    * parquet footer reads. Synchronized: parallel suites sharing one
    * session must not race the write. */
  def ensure(spark: SparkSession, dir: String): (String, String) =
    synchronized {
      val fp = graft.index.IndexStore.fingerprint(spark,
        Seq(s"$dir/orders.parquet", s"$dir/lineitem.parquet"))
      val ot = tableName("orders", dir, fp)
      val lt = tableName("lineitem", dir, fp)
      def build(name: String, df: => DataFrame, key: String,
          base: String): Unit =
        if (!spark.catalog.tableExists(name)) {
          // drop stale same-base layouts (older fingerprints): catalog
          // registrations first, then their files under the layout root
          spark.catalog.listTables().collect()
            .map(_.name)
            .filter(n => n.startsWith(s"graft_bj_${base}_${dirSlug(dir)}_")
              && n != name)
            .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
          val rootP = new Path(layoutRoot(dir))
          val fs = rootP.getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          if (fs.exists(rootP))
            fs.listStatus(rootP)
              .filter(_.getPath.getName.startsWith(s"${base}_"))
              .foreach(st => fs.delete(st.getPath, true))
          df.write.mode("overwrite")
            .bucketBy(Buckets, key).sortBy(key)
            .option("path", s"${layoutRoot(dir)}/${base}_$fp")
            .saveAsTable(name)
        }
      build(ot, Tables.orders(spark, dir)
          .select("o_orderkey", "o_custkey", "o_totalprice"),
        "o_orderkey", "orders")
      build(lt, Tables.lineitem(spark, dir)
          .select("l_orderkey", "l_quantity", "l_extendedprice"),
        "l_orderkey", "lineitem")
      (ot, lt)
    }

  /** The co-located join the layout exists for: revenue-weighted
    * lineitem rollup per customer, joined bucket-to-bucket. Throws if
    * the physical plan re-shuffles either side (the layout contract) or
    * ignores the bucket pruning. */
  def customerQuantities(spark: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = ensure(spark, dir)
    // hint("merge") pins the sort-merge path: at test scale the orders
    // side is broadcast-sized, which would ALSO be exchange-free but
    // demonstrates nothing about the layout a fact⋈fact join needs
    val joined = spark.table(lt).hint("merge")
      .join(spark.table(ot), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n_items"))
    val plan = joined.queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("SortMergeJoin")
    require(joinIdx >= 0,
      s"bucketed_join: expected a SortMergeJoin in the plan:\n$plan")
    require(!plan.substring(joinIdx).contains("Exchange"),
      s"bucketed_join: the bucketed join re-shuffled a side:\n$plan")
    require(plan.contains("SelectedBucketsCount"),
      s"bucketed_join: scan ignored the bucket layout:\n$plan")
    joined
  }
}
