package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Whole-stage-codegen'd quantization kernels: coarse-cell argmin
  * assignment (plain and MIPS-augmented), PQ subspace encode, and the
  * per-row ADC lookup-table score. These replace the typed
  * `.map`/`.mapPartitions` closures in the index build and batch-probe
  * paths — a typed closure deserializes every row into Scala objects
  * (boxing each vector element); these read the UnsafeRow arrays in
  * place and stay inside whole-stage codegen.
  *
  * Arithmetic is IDENTICAL (same accumulation order, same strict-< /
  * lowest-index tie rule, same `Math.round(x·1e6)/1e6` rounding) to the
  * closures they replace — the DuckDB oracles pin bit-equality.
  * Codebooks ride along as reference objects (driver-built, tiny), not
  * as literal expression trees: a ~1000-term literal tree falls out of
  * codegen (measured 10× slower, see ProductQuant.searchAdc history);
  * a reference object costs one field access.
  */
trait VecArrayKernel { self: Expression =>
  protected def vecElemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other =>
      throw new IllegalArgumentException(s"expected array type, got $other")
  }

  protected def vecOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }

  @inline protected final def getD(a: ArrayData, et: DataType, i: Int): Double =
    et match {
      case FloatType => a.getFloat(i).toDouble
      case _         => a.getDouble(i)
    }

  protected def getterJava(et: DataType, arr: String, i: String): String =
    et match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }
}

/** Argmin cell id of a vector over a driver-built centroid table, the
  * IVF coarse-assignment kernel (strict `<`, lowest index wins — the
  * rule every SQL oracle mirrors with `row_number ORDER BY d2, cell`).
  *
  * `augM2` = Some(M²) switches to the MIPS augmented assignment
  * (Bachrach et al., RecSys 2014): centroids are (dim+1)-dim, the
  * vector's implicit last coordinate is sqrt(max(0, M² − ‖v‖²)), and the
  * augmented term accumulates LAST — exactly [[graft.knn.Ann.augmentedCellOf]].
  */
case class NearestCellExpr(child: Expression, centroids: Seq[Seq[Double]],
    augM2: Option[Double] = None) extends UnaryExpression
    with VecArrayKernel {
  override def prettyName: String = "nearest_cell"
  override def dataType: DataType = IntegerType

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (vecOk(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> input, got ${child.dataType}")

  private def centDim: Int = cents(0).length - augM2.map(_ => 1).getOrElse(0)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val et = vecElemType(child)
    val n = a.numElements()
    if (n != centDim)
      throw new IllegalArgumentException(
        s"$prettyName: vector dim $n != centroid dim $centDim")
    var aug = 0.0
    if (augM2.isDefined) {
      var n2 = 0.0; var i = 0
      while (i < n) { val x = getD(a, et, i); n2 += x * x; i += 1 }
      aug = math.sqrt(math.max(0.0, augM2.get - n2))
    }
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0.0; var i = 0
      while (i < n) { val x = getD(a, et, i) - cent(i); d += x * x; i += 1 }
      if (augM2.isDefined) { val x = aug - cent(n); d += x * x }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val x = ctx.freshName("x"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val aug = ctx.freshName("aug")
      val cent = ctx.freshName("cent"); val n2 = ctx.freshName("n2")
      val augCode = augM2.map { m2 =>
        s"""double $n2 = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = ${getterJava(vecElemType(child), a, i)};
           |  $n2 += $x * $x;
           |}
           |$aug = java.lang.Math.sqrt(java.lang.Math.max(0.0, $m2 - $n2));
           |""".stripMargin
      }.getOrElse("")
      val augTerm = augM2.map { _ =>
        s"{ double $x = $aug - $cent[$n]; $d += $x * $x; }"
      }.getOrElse("")
      s"""
         |int $n = $a.numElements();
         |if ($n != $centDim) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: vector dim " + $n + " != centroid dim $centDim");
         |}
         |double $aug = 0.0;
         |$augCode
         |int $best = 0; double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $cent = $centsRef[$c];
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (${getterJava(vecElemType(child), a, i)}) - $cent[$i];
         |    $d += $x * $x;
         |  }
         |  $augTerm
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ encode: per subspace mi, the argmin sub-centroid index (strict
  * `<`, lowest index) — returns the M codes as array<tinyint>, the
  * stored form, widening to array<smallint> when any codebook has more
  * than 128 centroids (a byte holds argmin indexes 0..127 only; the
  * standard K=256 config would silently wrap negative and poison the
  * ADC LUT lookup). Same arithmetic as the encode loop it replaces in
  * IvfPqIndex.writeCells / ProductQuant.encode. */
case class PqEncodeExpr(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with VecArrayKernel {
  override def prettyName: String = "pq_encode"
  /** true when a code can exceed Byte.MaxValue (k up to 128 yields
    * indexes 0..127, the last value a byte can hold). */
  private def wide: Boolean = books.exists(_.length > 128)
  override def dataType: DataType =
    ArrayType(if (wide) ShortType else ByteType, containsNull = false)

  @transient private lazy val bks: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  private def m: Int = books.length
  private def subDim: Int = books.head.head.length

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (vecOk(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> input, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val et = vecElemType(child)
    if (a.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"$prettyName: vector dim ${a.numElements()} != ${m * subDim}")
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val base = mi * subDim
      val book = bks(mi)
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        var d = 0.0; var i = 0
        while (i < subDim) {
          val x = getD(a, et, base + i) - book(c)(i); d += x * x; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(mi) = best
      mi += 1
    }
    if (wide) new GenericArrayData(codes.map(_.toShort))
    else new GenericArrayData(codes.map(_.toByte))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bksRef = ctx.addReferenceObj("books", bks, "double[][][]")
      val i = ctx.freshName("i"); val c = ctx.freshName("c")
      val d = ctx.freshName("d"); val x = ctx.freshName("x")
      val mi = ctx.freshName("mi"); val base = ctx.freshName("base")
      val book = ctx.freshName("book"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val codes = ctx.freshName("codes")
      val codeJava = if (wide) "short" else "byte"
      s"""
         |if ($a.numElements() != ${m * subDim}) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: vector dim " + $a.numElements() + " != ${m * subDim}");
         |}
         |$codeJava[] $codes = new $codeJava[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $base = $mi * $subDim;
         |  double[][] $book = $bksRef[$mi];
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $book.length; $c++) {
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      double $x = (${getterJava(vecElemType(child), a, s"$base + $i")}) - $book[$c][$i];
         |      $d += $x * $x;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$mi] = ($codeJava) $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score from STORED codes and a per-row LUT column:
  * Math.round(sqrt(Σ_mi lut[mi][codes[mi]])·1e6)/1e6 — the scoring half
  * of IVFADC (Jégou et al., TPAMI 2011). `left` = array<tinyint|int>
  * codes; `right` = array<array<double>> LUT (a literal for one query, a
  * broadcast-joined column for a batch). */
case class AdcLutScore(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "pq_adc_score"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val codesOk = left.dataType match {
      case ArrayType(ByteType | ShortType | IntegerType, _) => true
      case _ => false
    }
    val lutOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (codesOk && lutOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<tinyint|smallint|int>, array<array<double>>), " +
          s"got ${left.dataType} and ${right.dataType}")
  }

  private def codeGetter(arr: String, i: String): String =
    left.dataType match {
      case ArrayType(ByteType, _)  => s"(int) $arr.getByte($i)"
      case ArrayType(ShortType, _) => s"(int) $arr.getShort($i)"
      case _                       => s"$arr.getInt($i)"
    }

  private def codeAt(a: ArrayData, i: Int): Int = left.dataType match {
    case ArrayType(ByteType, _)  => a.getByte(i).toInt
    case ArrayType(ShortType, _) => a.getShort(i).toInt
    case _                       => a.getInt(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m != lut.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: ${lut.numElements()} LUT rows for $m codes")
    var acc = 0.0
    var mi = 0
    while (mi < m) { acc += lut.getArray(mi).getDouble(codeAt(codes, mi)); mi += 1 }
    math.round(math.sqrt(acc) * 1e6) / 1e6
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m"); val mi = ctx.freshName("mi")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $codes.numElements();
         |if ($m != $lut.numElements()) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: " + $lut.numElements() + " LUT rows for " + $m + " codes");
         |}
         |double $acc = 0.0;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  $acc += $lut.getArray($mi).getDouble(${codeGetter(codes, mi)});
         |}
         |${ev.value} = java.lang.Math.round(java.lang.Math.sqrt($acc) * 1.0E6) / 1.0E6;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
