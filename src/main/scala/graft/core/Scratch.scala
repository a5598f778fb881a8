package graft.core

/** Root for per-rep THROWAWAY artifacts: streaming checkpoints/WALs,
  * per-rep stream source/sink copies, scratch collection stores, the
  * gv-persistence round-trip dir — everything a query creates, reads
  * back, and deletes within one rep.
  *
  * Default prefers a tmpfs (`/dev/shm`) when the box has a writable
  * one, else `java.io.tmpdir` (r17, guide §6): the micro-batch and
  * collection-lifecycle walls are dominated by per-batch offset/commit
  * logs, state-store deltas, and partitioned-commit protocol — scratch
  * file round-trips whose durability buys nothing because the artifact
  * is deleted seconds later. On a real deployment the same knob points
  * at the fast local disk (Spark's own local-dir guidance); a durable
  * checkpoint for a LONG-LIVED stream belongs on durable storage and is
  * the caller's choice — this root is only for the engine's per-rep
  * scratch. Override with GRAFT_SCRATCH_DIR.
  *
  * Persistent, fingerprint-keyed artifacts (the index store, the
  * multi-file stream source copies) deliberately do NOT use this root —
  * they live under IndexStore.root and must survive across runs.
  */
object Scratch {
  lazy val root: java.nio.file.Path = {
    val p = sys.env.get("GRAFT_SCRATCH_DIR")
      .orElse(Some("/dev/shm").filter { d =>
        val f = new java.io.File(d); f.isDirectory && f.canWrite
      })
      .getOrElse(System.getProperty("java.io.tmpdir"))
    java.nio.file.Paths.get(p)
  }

  /** A fresh scratch directory under [[root]]. Callers delete it when
    * the rep's result is pinned (same contract as the former
    * `Files.createTempDirectory` sites). */
  def dir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix).toString
}
