package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-level invariants the driver contract silently depends on:
  * SparkEntry exposes the catalog as name-keyed Maps, so a duplicate
  * name would SHADOW an entry without any error — one query would
  * simply stop being verified. Names are also used as output
  * directories and JSON keys by Verify.
  */
class CatalogSpec extends AnyFunSuite {

  test("catalog names are unique (Map wiring would silently shadow dups)") {
    val names = Catalog.all.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate catalog names: $dups")
  }

  test("catalog names are path- and JSON-safe identifiers") {
    val bad = Catalog.all.map(_.name).filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"unsafe catalog names: $bad")
  }

  test("every catalog entry carries a DuckDB oracle (round-8 invariant)") {
    val unoracled = Catalog.all.filter(_.oracle.isEmpty).map(_.name)
    assert(unoracled.isEmpty,
      s"entries without an oracle (driver downgrades them to a weaker " +
        s"rows-only check): $unoracled")
  }

  test("io-class tags name real catalog entries and classify every entry") {
    // Catalog.FileHeavy is a static name set (r17) — a renamed entry
    // would silently fall back to "compute" and a band fire would carry
    // the wrong class next to its io_ratio
    val names = Catalog.all.map(_.name).toSet
    val stale = Catalog.FileHeavy -- names
    assert(stale.isEmpty, s"FileHeavy tags name no catalog entry: $stale")
    // the class function totals over the catalog, and the known r16
    // run-2 fire set is all file-class (the adjudication the tag exists
    // for)
    assert(Catalog.all.forall(q =>
      Set("file", "compute")(Catalog.ioClass(q.name))))
    Seq("collection_ann_batch", "collection_ann_search",
      "stream_asof_live", "ann_recall_report", "near_dup_recall")
      .foreach(n => assert(Catalog.ioClass(n) == "file", n))
    Seq("q1_agg", "graph_pagerank", "dedup_semantic", "text_repetition")
      .foreach(n => assert(Catalog.ioClass(n) == "compute", n))
  }
}
