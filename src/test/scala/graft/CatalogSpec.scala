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
}
