package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{CypherLite, Graph}

/** WHERE/RETURN breadth pin for the Cypher subset (VERDICT r8 #8): the
  * reference parser accepts all six comparison operators and
  * multi-property RETURN (jcolano/fastpyvectordb `graph.py:1061-1111`);
  * this table drives each op through CypherLite on a graph whose rows
  * are chosen so every op selects a DIFFERENT id set — a mis-parsed or
  * mis-mapped operator cannot alias another's result. Null semantics
  * ride along: `<>` requires presence (a null property never matches),
  * matching the reference's dict-lookup behavior.
  */
class CypherBreadthSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val g = Graph(
    Seq(
      ("a:1", "Doc", "alpha", 1.0, "x"),
      ("a:2", "Doc", "beta", 2.0, "y"),
      ("a:3", "Doc", "gamma", 3.0, null.asInstanceOf[String]),
      ("a:4", "Doc", "delta", 4.0, "x"))
      .toDF("id", "label", "name", "num", "seg"),
    Seq(("a:1", "a:2", "REL")).toDF("src", "dst", "type"))

  private def ids(q: String): Seq[String] =
    CypherLite.query(g, q).select("d_id").as[String].collect().toSeq.sorted

  test("all six comparison operators select the right rows") {
    val cases = Seq(
      ("=", "MATCH (d:Doc) WHERE d.num = 2 RETURN d.id", Seq("a:2")),
      ("<>", "MATCH (d:Doc) WHERE d.seg <> 'x' RETURN d.id",
        Seq("a:2")), // null seg (a:3) must NOT match — presence required
      ("<", "MATCH (d:Doc) WHERE d.num < 2 RETURN d.id", Seq("a:1")),
      (">", "MATCH (d:Doc) WHERE d.num > 3 RETURN d.id", Seq("a:4")),
      ("<=", "MATCH (d:Doc) WHERE d.num <= 2 RETURN d.id",
        Seq("a:1", "a:2")),
      (">=", "MATCH (d:Doc) WHERE d.num >= 3 RETURN d.id",
        Seq("a:3", "a:4")))
    cases.foreach { case (op, q, expect) =>
      assert(ids(q) == expect, s"operator $op: query $q")
    }
  }

  test("multi-property RETURN projects each item, in order") {
    val out = CypherLite.query(g,
      "MATCH (d:Doc) WHERE d.num >= 2 AND d.num <= 3 " +
        "RETURN d.id, d.name, d.num ORDER BY d.id")
    assert(out.columns.toSeq == Seq("d_id", "d_name", "d_num"))
    assert(out.as[(String, String, Double)].collect().toSeq ==
      Seq(("a:2", "beta", 2.0), ("a:3", "gamma", 3.0)))
  }

  test("string comparisons order lexicographically like the reference") {
    assert(ids("MATCH (d:Doc) WHERE d.name >= 'delta' RETURN d.id") ==
      Seq("a:3", "a:4")) // delta, gamma ≥ 'delta'; alpha/beta below
  }
}
