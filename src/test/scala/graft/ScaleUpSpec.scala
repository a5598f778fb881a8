package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The decade-scale measurements (SURVEY §6.4/§6.6) rest on [[ScaleUp]]
  * producing replicas with the SAME per-key cardinalities as the base —
  * N disjoint FK-consistent copies, not a hot-key stress or a
  * duplicate-vector cluster. Pin that: row counts scale by N, no join
  * orphans appear, join cardinality scales by exactly N (copies never
  * cross-join), and embedding copies are DISTINCT vectors with the same
  * element multiset (circular shift).
  */
class ScaleUpSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  private val N = 3

  test("key-shifted copies keep FK joins intact and disjoint") {
    val orders = ScaleUp.scaled(spark, sf, "orders", N)
    val cust = ScaleUp.scaled(spark, sf, "customer", N)
    val baseOrders = spark.read.parquet(s"$sf/orders.parquet")
    assert(orders.count() == N * baseOrders.count())
    val joined = orders.join(cust, col("o_custkey") === col("c_custkey"))
    val baseJoined = baseOrders.join(
      spark.read.parquet(s"$sf/customer.parquet"),
      col("o_custkey") === col("c_custkey"))
    // every order still finds its customer (no orphans), and exactly N×
    // the base matches (copies never match each other's keys)
    assert(joined.count() == N * baseJoined.count())
    assert(orders.join(cust, col("o_custkey") === col("c_custkey"),
      "left_anti").isEmpty, "scaled orders must keep their customer FK")
  }

  test("embedding copies are distinct vectors with the base's element multiset") {
    val emb = ScaleUp.scaled(spark, sf, "embeddings", N)
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    assert(emb.count() == N * base.count())
    val first = base.orderBy("vec_id").limit(1)
      .select(col("vec_id").cast("long"), col("embedding")).head
    val baseVec = first.getSeq[Float](1)
    val copies = emb
      .filter(col("vec_id").cast("long") % 50000000L === first.getLong(0) &&
        col("vec_id").cast("long") >= 50000000L)
      .select("embedding").collect().map(_.getSeq[Float](0))
    assert(copies.length == N - 1)
    copies.foreach { v =>
      assert(v != baseVec, "copy must be a DIFFERENT vector (LSH spread)")
      assert(v.sorted == baseVec.sorted,
        "circular shift preserves the element multiset")
    }
  }

  test("documented bounds are enforced (ADVICE r9 / VERDICT r14 #5)") {
    // copies ≥ 101 would wrap the int32 key cast even at the dense
    // 2·10⁷ stride — corrupt FKs, silently, on the non-ANSI cast path
    val ex = intercept[IllegalArgumentException] {
      ScaleUp.scaled(spark, sf, "orders", 101)
    }
    assert(ex.getMessage.contains("[1, 100]"))
    intercept[IllegalArgumentException] {
      ScaleUp.scaled(spark, sf, "orders", 0)
    }
  }

  test("dense stride (copies > 42) keeps copies disjoint and FK-consistent") {
    // the 100x draw's stride is 2·10⁷ — prove join cardinality still
    // scales by exactly N (copies never cross-match) at a copies count
    // past the classic 42 bound
    val n = 50
    val orders = ScaleUp.scaled(spark, sf, "orders", n)
    val cust = ScaleUp.scaled(spark, sf, "customer", n)
    val baseOrders = spark.read.parquet(s"$sf/orders.parquet")
    val baseJoined = baseOrders.join(
      spark.read.parquet(s"$sf/customer.parquet"),
      col("o_custkey") === col("c_custkey"))
    assert(orders.count() == n * baseOrders.count())
    assert(orders.join(cust, col("o_custkey") === col("c_custkey")).count()
      == n * baseJoined.count())
    // keys must remain exactly representable in the column's int type
    val mx = orders.agg(max(col("o_orderkey").cast("long"))).head.getLong(0)
    assert(mx == (n - 1) * 20000000L +
      baseOrders.agg(max(col("o_orderkey").cast("long"))).head.getLong(0))
  }

  test("vector shift is non-degenerate at dim multiples (ADVICE r9)") {
    // the old `c % d` shift was 0 whenever the copy index was a
    // multiple of the embedding dim — identical copies, an LSH
    // duplicate cluster instead of spread. The fixed shift
    // 1 + (c-1) % (d-1) stays in [1, d-1] for every copy index.
    val d = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("size(embedding) d").head.getInt(0)
    (1 to 42).foreach { c =>
      val s = 1 + (c - 1) % (d - 1)
      assert(s >= 1 && s <= d - 1, s"shift degenerate for copy $c")
    }
  }
}
