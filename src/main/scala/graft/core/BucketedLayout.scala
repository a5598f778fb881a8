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

  // `_bucketed2`: the publish protocol (ready marker inside the dir)
  // changed in r9 — a fresh root keeps it from meeting marker-less
  // legacy generations, which it would pointlessly rebuild against
  private def layoutRoot(dir: String): String =
    s"${graft.index.IndexStore.root}/_bucketed2/" +
      graft.index.IndexStore.slug(dir)

  /** Ensure the bucketed `orders`/`lineitem` copies for `dir` exist and
    * are registered in this session's catalog; returns their table
    * names. Table name and path are keyed by the SOURCE FINGERPRINT
    * (same auto-fresh contract as [[graft.index.IndexStore]] and
    * [[PartitionedLayout]]): a regenerated source changes the
    * fingerprint, so the memo misses and a new generation is built.
    *
    * Cross-JVM safe (VERDICT r8 #1): the files are built into a tmp dir
    * and atomically published via [[LayoutPublish]] — a concurrent
    * builder in another JVM either wins the rename or adopts the
    * winner's complete copy, and NOTHING deletes a fingerprint-addressed
    * generation another live session may be mid-scan on (stale
    * generations are grace-period garbage-collected instead). The
    * bucketing metadata is re-attached by registering an external
    * `CLUSTERED BY` table over the published location — Spark recovers
    * each file's bucket id from its name, so registration is pure
    * catalog work for an adopter. `synchronized` still serializes
    * in-JVM callers (parallel suites sharing one session). */
  def ensure(spark: SparkSession, dir: String): (String, String) =
    synchronized {
      graft.index.IndexStore.gcLegacyRoots(spark)
      val fp = graft.index.IndexStore.fingerprint(spark,
        Seq(s"$dir/orders.parquet", s"$dir/lineitem.parquet"))
      val ot = tableName("orders", dir, fp)
      val lt = tableName("lineitem", dir, fp)
      def build(name: String, df: => DataFrame, key: String,
          base: String): Unit =
        if (!spark.catalog.tableExists(name)) {
          val src = df
          val dst = new Path(s"${layoutRoot(dir)}/${base}_$fp")
          LayoutPublish.publish(spark, dst) { tmp =>
            // bucketBy can only saveAsTable — write through a throwaway
            // external table name at the tmp path, then drop the name
            // (files stay: external). The published dir is adopted below
            // via an explicit CLUSTERED BY registration, same as a
            // session that never built.
            val tmpName = s"${name}_w${java.util.UUID.randomUUID()
              .toString.replace("-", "")}"
            src.write.mode("overwrite")
              .bucketBy(Buckets, key).sortBy(key)
              .option("path", tmp.toString)
              .saveAsTable(tmpName)
            spark.sql(s"DROP TABLE IF EXISTS $tmpName")
          }
          spark.sql(
            s"""CREATE TABLE IF NOT EXISTS $name (${src.schema.toDDL})
               |USING parquet
               |CLUSTERED BY ($key) SORTED BY ($key) INTO $Buckets BUCKETS
               |LOCATION '$dst'""".stripMargin)
          // grace-period GC of cold stale generations (+ their catalog
          // names) — never the generation just published/adopted
          LayoutPublish.gcStale(spark, dst.getParent, s"${base}_",
            dst.getName) { gone =>
            if (gone.startsWith(s"${base}_"))
              spark.sql(s"DROP TABLE IF EXISTS " +
                tableName(base, dir, gone.stripPrefix(s"${base}_")))
          }
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
