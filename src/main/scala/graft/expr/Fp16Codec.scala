package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** IEEE 754 binary16 (half precision) conversions — the bit-level core of
  * the reference's fp16 storage compression (`binary_persistence.py:
  * 347-349` does `vectors.astype(np.float16)`): round-to-nearest-even,
  * subnormal and overflow handling per the standard. Public-domain
  * algorithm (the classic float→half bit manipulation, as in npy_half /
  * JDK 20 Float.floatToFloat16).
  */
object Fp16 {
  /** float → binary16 bits, round-to-nearest-even. */
  def fromFloat(f: Float): Short = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val exp = (bits >>> 23) & 0xff // biased fp32 exponent
    val sig = bits & 0x7fffff
    if (exp == 0xff) { // inf / NaN
      return (sign | 0x7c00 | (if (sig != 0) 0x200 else 0)).toShort
    }
    if (exp >= 143) { // unbiased >= 16 → overflow to ±inf
      return (sign | 0x7c00).toShort
    }
    if (exp >= 113) { // normal fp16 range (unbiased −14..15)
      // drop 13 mantissa bits with round-to-nearest-even; a mantissa
      // carry propagates into the exponent field correctly by addition
      var h = ((exp - 112) << 10) | (sig >>> 13)
      val round = sig & 0x1fff
      if (round > 0x1000 || (round == 0x1000 && (h & 1) == 1)) h += 1
      return (sign | h).toShort
    }
    if (exp < 102) { // below half the smallest subnormal → ±0
      return sign.toShort
    }
    // subnormal fp16: value = h_sig · 2⁻²⁴
    val sig2 = sig | 0x800000
    val shift = 126 - exp // 14..24
    var h = sig2 >>> shift
    val dropped = sig2 & ((1 << shift) - 1)
    val half = 1 << (shift - 1)
    if (dropped > half || (dropped == half && (h & 1) == 1)) h += 1
    // h == 0x400 means it rounded up to the smallest normal — the bit
    // layout already encodes that correctly (carry into exponent field)
    (sign | h).toShort
  }

  /** binary16 bits → float (exact; no rounding needed upward). */
  def toFloat(h: Short): Float = {
    val bits = h & 0xffff
    val sign = if ((bits & 0x8000) != 0) -1f else 1f
    val exp = (bits >>> 10) & 0x1f
    val sig = bits & 0x3ff
    if (exp == 0x1f)
      return if (sig != 0) Float.NaN
      else if (sign < 0) Float.NegativeInfinity else Float.PositiveInfinity
    if (exp == 0) sign * sig * 5.9604645e-8f // 2⁻²⁴, exact as float
    else sign * (0x400 | sig) * math.pow(2.0, exp - 25).toFloat
  }
}

abstract class Fp16CodecExpr extends UnaryExpression {
  protected def inOk(dt: DataType): Boolean
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(et, _) if inOk(et) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName: unsupported input $other")
    }
}

/** array<float|double> → array<smallint> of binary16 bit patterns. */
case class Fp16Encode(child: Expression) extends Fp16CodecExpr {
  override def prettyName: String = "fp16_encode"
  override def dataType: DataType = ArrayType(ShortType, containsNull = false)
  protected def inOk(dt: DataType): Boolean =
    dt == FloatType || dt == DoubleType

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      // vectors are dense: a null element would silently encode as the
      // bits of 0.0 (getDouble on a null slot) — reject it instead, the
      // same contract as the distance kernels
      if (a.isNullAt(i))
        throw new IllegalArgumentException(s"$prettyName: null element at $i")
      val f = if (isFloat) a.getFloat(i) else a.getDouble(i).toFloat
      out(i) = Fp16.fromFloat(f)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val get =
        if (isFloat) s"$a.getFloat($i)" else s"(float) $a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |short[] $out = new short[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    throw new IllegalArgumentException("$prettyName: null element at " + $i);
         |  }
         |  $out[$i] = graft.expr.Fp16.fromFloat($get);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<smallint> of binary16 bit patterns → array<float>. */
case class Fp16Decode(child: Expression) extends Fp16CodecExpr {
  override def prettyName: String = "fp16_decode"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  protected def inOk(dt: DataType): Boolean = dt == ShortType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = Fp16.toFloat(a.getShort(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |float[] $out = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = graft.expr.Fp16.toFloat($a.getShort($i));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
