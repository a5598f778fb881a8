package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import graft.index.IndexStore

/** Pin for the one-shot legacy-root GC (ADVICE r9): a FormatVersion
  * bump orphans the whole previous `graft_indexes/v{k}` root, and the
  * pre-r9 `_bucketed`/`_partitioned` layout trees inside the current
  * root had no deleting code path — both must be grace-collected, and
  * a root touched within the grace window must be left alone.
  */
class LegacyGcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mk(p: Path): Path = {
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(p)
    f.create(new Path(p, "payload"), true).close()
    p
  }
  private def exists(p: Path): Boolean =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)

  test("cold prior-version roots and legacy layout trees are collected; fresh ones survive") {
    val parent = new Path(IndexStore.root).getParent
    // v1 < FormatVersion is always a legacy name; the current root's
    // _bucketed/_partitioned are the pre-r9 layout trees
    val oldVersionRoot = mk(new Path(parent, "v1"))
    val oldBucketed = mk(new Path(s"${IndexStore.root}/_bucketed"))
    val oldPartitioned = mk(new Path(s"${IndexStore.root}/_partitioned"))
    // pre-r14 un-namespaced decade dump (bare x10_<fp>) vs a namespaced
    // one (carries the base-corpus slug) — only the former is legacy
    val oldDump = mk(new Path(
      s"${IndexStore.root}/_decade_verify/x10_0123456789abcdef"))
    // Long.toHexString does not zero-pad (ADVICE r15): a legacy dump
    // whose fingerprint has a high zero nibble is SHORTER than 16 hex
    // chars and must still be reclaimed
    val oldShortDump = mk(new Path(
      s"${IndexStore.root}/_decade_verify/x10_3f2a9c"))
    val newDump = mk(new Path(
      s"${IndexStore.root}/_decade_verify/x10_root_testdata_sf0.1_0123456789abcdef"))
    val rootExisted = exists(new Path(IndexStore.root))
    // grace > age: nothing may be touched
    sys.props("graft.layout.gc.grace.ms") = (60L * 60 * 1000).toString
    try {
      IndexStore.runLegacyGc(spark)
      assert(exists(oldVersionRoot) && exists(oldBucketed) &&
        exists(oldPartitioned) && exists(oldDump) && exists(oldShortDump),
        "roots inside the grace window must be left alone")
      // grace 0: everything just created is already "cold"
      sys.props("graft.layout.gc.grace.ms") = "0"
      Thread.sleep(5) // mtime strictly below the cutoff
      IndexStore.runLegacyGc(spark)
      assert(!exists(oldVersionRoot), "prior-version root must be collected")
      assert(!exists(oldBucketed), "legacy _bucketed tree must be collected")
      assert(!exists(oldPartitioned),
        "legacy _partitioned tree must be collected")
      assert(!exists(oldDump),
        "legacy un-namespaced decade dump must be collected")
      assert(!exists(oldShortDump),
        "legacy dump with an unpadded (<16 hex) fingerprint must be collected")
      assert(exists(newDump),
        "namespaced decade dumps are runCert's to manage, not legacy gc's")
      // the CURRENT version root is never a target
      assert(exists(new Path(IndexStore.root)) == rootExisted,
        "the current version root must be untouched")
    } finally {
      sys.props.remove("graft.layout.gc.grace.ms")
      val f = newDump.getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.delete(newDump, true)
    }
  }
}
