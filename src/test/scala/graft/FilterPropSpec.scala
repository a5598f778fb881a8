package graft

import scala.util.Random
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.filter._

/** Differential test: random predicates over random rows (with NULLs),
  * Spark evaluation vs an in-memory evaluator implementing the reference
  * contract (vectordb_optimized.py:79-184): a missing field fails every
  * leaf — including ne/nin — and composition is two-valued.
  */
class FilterPropSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val rnd = new Random(42)
  private val cats = Seq("a", "b", "c", "dd", "e1")

  private case class R(id: Int, cat: Option[String], x: Option[Double],
      n: Option[Long])

  private val rows: Seq[R] = (0 until 200).map { i =>
    R(i,
      if (rnd.nextDouble() < 0.2) None else Some(cats(rnd.nextInt(cats.size))),
      if (rnd.nextDouble() < 0.2) None else Some(rnd.nextInt(10).toDouble),
      if (rnd.nextDouble() < 0.2) None else Some(rnd.nextInt(100).toLong))
  }

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("id", IntegerType, false),
      StructField("cat", StringType, true),
      StructField("x", DoubleType, true),
      StructField("n", LongType, true)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r =>
        Row(r.id, r.cat.orNull, r.x.map(Double.box).orNull,
          r.n.map(Long.box).orNull)): _*),
      schema).cache()
  }

  private def field(r: R, f: String): Option[Any] = f match {
    case "cat" => r.cat
    case "x"   => r.x
    case "n"   => r.n
  }

  /** Reference-contract evaluator. */
  private def eval(p: Pred, r: R): Boolean = p match {
    case Eq(f, v)  => field(r, f).contains(v)
    case Ne(f, v)  => field(r, f).exists(_ != v)
    case Gt(f, v)  => cmp(r, f, v).exists(_ > 0)
    case Gte(f, v) => cmp(r, f, v).exists(_ >= 0)
    case Lt(f, v)  => cmp(r, f, v).exists(_ < 0)
    case Lte(f, v) => cmp(r, f, v).exists(_ <= 0)
    case In(f, vs)  => field(r, f).exists(vs.contains)
    case Nin(f, vs) => field(r, f).exists(a => !vs.contains(a))
    case Contains(f, s) => field(r, f).exists(_.toString.contains(s))
    case Regex(f, pat) =>
      field(r, f).exists(a => pat.r.findFirstIn(a.toString).isDefined)
    case And(ps) => ps.forall(eval(_, r))
    case Or(ps)  => ps.exists(eval(_, r))
    case Not(q)  => !eval(q, r)
  }

  private def cmp(r: R, f: String, v: Any): Option[Int] =
    (field(r, f), v) match {
      case (Some(a: Double), b: Double) => Some(a.compareTo(b))
      case (Some(a: Long), b: Long)     => Some(a.compareTo(b))
      case (Some(a: String), b: String) => Some(a.compareTo(b))
      case _                            => None
    }

  private def genLeaf(): Pred = rnd.nextInt(10) match {
    case 0 => Eq("cat", cats(rnd.nextInt(cats.size)))
    case 1 => Ne("cat", cats(rnd.nextInt(cats.size)))
    case 2 => Gt("x", rnd.nextInt(10).toDouble)
    case 3 => Gte("n", rnd.nextInt(100).toLong)
    case 4 => Lt("x", rnd.nextInt(10).toDouble)
    case 5 => Lte("n", rnd.nextInt(100).toLong)
    case 6 => In("cat", Seq.fill(2)(cats(rnd.nextInt(cats.size))))
    case 7 => Nin("cat", Seq.fill(2)(cats(rnd.nextInt(cats.size))))
    case 8 => Contains("cat", cats(rnd.nextInt(cats.size)).take(1))
    case 9 => Regex("cat", "^[ab]")
  }

  private def genPred(depth: Int): Pred =
    if (depth == 0 || rnd.nextDouble() < 0.4) genLeaf()
    else rnd.nextInt(3) match {
      case 0 => And(Seq.fill(2)(genPred(depth - 1)))
      case 1 => Or(Seq.fill(2)(genPred(depth - 1)))
      case 2 => Not(genPred(depth - 1))
    }

  test("50 random predicates agree with the reference evaluator") {
    for (i <- 1 to 50) {
      val p = genPred(3)
      val got = df.filter(p.column).select("id")
        .collect().map(_.getInt(0)).toSet
      val want = rows.filter(eval(p, _)).map(_.id).toSet
      assert(got == want, s"case $i diverged for predicate: $p")
    }
  }
}
