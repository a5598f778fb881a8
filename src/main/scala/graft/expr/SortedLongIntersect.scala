package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |A ∩ B| of two SORTED-ascending distinct long arrays as one merge
  * scan — the hot kernel of every shingle-Jaccard verification.
  * `size(array_intersect(a, b))` builds a hash set per CALL (per
  * candidate pair, twice when both the intersection and the union-size
  * denominator reference it); the merge scan is O(|A|+|B|) with zero
  * allocation. Inputs MUST be sorted distinct (graft shingle arrays are
  * produced sorted by `Dedup.shinglesOf`), and the scan THROWS when it
  * visits a descending step — a tripwire (it cannot prove sortedness of
  * unvisited tails) so misuse fails loudly instead of silently
  * undercounting. Not a general array_intersect replacement — it is the
  * specialized pair-verification kernel. DuckDB oracle twin:
  * `len(list_intersect(a, b))` (set semantics — element order never
  * changes the count).
  */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "sorted_long_intersect_size"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> inputs, " +
          s"got ${left.dataType} and ${right.dataType}")
  }

  private def unsorted(): Nothing =
    throw new IllegalArgumentException(
      s"$prettyName: input array is not sorted ascending")

  private def nullElement(): Nothing =
    throw new IllegalArgumentException(
      s"$prettyName: null array element (inputs must be dense shingle arrays)")

  // Static nullability of each side: shinglesOf arrays are dense, but a
  // schema that ADMITS null elements must pay a runtime check — getLong on
  // a null slot reads an undefined value (0 for UnsafeArrayData) and would
  // silently miscount without even tripping the sortedness tripwire. The
  // check is emitted only when the static type says containsNull=true, so
  // the dense hot path stays branch-free.
  private def mayHaveNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _                => true
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val checkA = mayHaveNulls(left); val checkB = mayHaveNulls(right)
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    var px = Long.MinValue; var py = Long.MinValue
    while (i < na && j < nb) {
      if ((checkA && a.isNullAt(i)) || (checkB && b.isNullAt(j))) nullElement()
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < px || y < py) unsorted()
      px = x; py = y
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val px = ctx.freshName("px"); val py = ctx.freshName("py")
      val nullCheck = (if (mayHaveNulls(left)) s"$a.isNullAt($i)" :: Nil else Nil) ++
        (if (mayHaveNulls(right)) s"$b.isNullAt($j)" :: Nil else Nil)
      val nullGuard =
        if (nullCheck.isEmpty) ""
        else
          s"""if (${nullCheck.mkString(" || ")}) {
             |  throw new IllegalArgumentException(
             |    "$prettyName: null array element (inputs must be dense shingle arrays)");
             |}""".stripMargin
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0, $j = 0, $n = 0;
         |long $px = Long.MIN_VALUE, $py = Long.MIN_VALUE;
         |while ($i < $na && $j < $nb) {
         |  $nullGuard
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x < $px || $y < $py) {
         |    throw new IllegalArgumentException(
         |      "$prettyName: input array is not sorted ascending");
         |  }
         |  $px = $x; $py = $y;
         |  if ($x == $y) { $n++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
