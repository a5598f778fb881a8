package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.expr.Fp16
import graft.quant.StorageCompression

/** fp16/int8 storage compression: bit-exact fp16 known values (IEEE
  * binary16, round-to-nearest-even), round-trip tolerance over the real
  * embeddings, and the int8 error bound.
  */
class StorageCompressionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private lazy val emb = Tables.embeddings(spark, SparkTestSession.sf)

  test("fp16 conversion matches IEEE binary16 on known values") {
    val cases = Seq(
      0.0f -> 0x0000, 0.5f -> 0x3800, 1.0f -> 0x3c00, -2.0f -> 0xc000,
      65504.0f -> 0x7bff, // largest finite half
      65520.0f -> 0x7c00, // overflow → +inf
      5.9604645e-8f -> 0x0001, // smallest subnormal 2⁻²⁴
      2.9802322e-8f -> 0x0000, // 2⁻²⁵: tie rounds to even (zero)
      1.00048828125f -> 0x3c00, // 1 + 2⁻¹¹: tie → even mantissa
      1.0014648f -> 0x3c02, // 1 + 3·2⁻¹¹: tie → even (up)
      Float.PositiveInfinity -> 0x7c00,
      Float.NegativeInfinity -> 0xfc00)
    cases.foreach { case (f, bits) =>
      assert((Fp16.fromFloat(f) & 0xffff) == bits,
        f"fromFloat($f) = 0x${Fp16.fromFloat(f) & 0xffff}%04x, want 0x$bits%04x")
    }
    assert((Fp16.fromFloat(Float.NaN) & 0x7c00) == 0x7c00 &&
      (Fp16.fromFloat(Float.NaN) & 0x3ff) != 0)
    assert(Fp16.toFloat(0x3800.toShort) == 0.5f)
    assert(Fp16.toFloat(0x0001.toShort) == 5.9604645e-8f)
    assert(Fp16.toFloat(0xc000.toShort) == -2.0f)
  }

  test("fp16 encode/decode round-trips within half-precision tolerance") {
    val enc = emb.select(col("vec_id"),
      StorageCompression.fp16Encode(col("embedding")).as("h"),
      col("embedding"))
    // stored form really is 2 bytes/element
    assert(enc.schema("h").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ShortType, containsNull = false))
    val bad = enc
      .select(col("vec_id"),
        StorageCompression.fp16Decode(col("h")).as("dec"), col("embedding"))
      .selectExpr("vec_id",
        // relative error ≤ 2⁻¹¹ for normals; absolute 2⁻²⁵ floor covers
        // the subnormal range
        """aggregate(zip_with(dec, embedding, (d, o) ->
          |  if(abs(d - o) <= greatest(abs(o) * 0.00048828125, 2.9802322e-8),
          |     0, 1)), 0, (a, b) -> a + b) as violations""".stripMargin)
      .agg(sum("violations")).head().getLong(0)
    assert(bad == 0L, s"$bad elements outside fp16 tolerance")
  }

  test("fp16 decode(encode(x)) is idempotent under re-encode") {
    // encode∘decode∘encode == encode: decoded values are exactly
    // representable, so a second pass must be bit-identical
    val diff = emb
      .select(StorageCompression.fp16Encode(col("embedding")).as("h"))
      .select(col("h"), StorageCompression.fp16Encode(
        StorageCompression.fp16Decode(col("h"))).as("h2"))
      .filter(col("h") =!= col("h2")).count()
    assert(diff == 0L)
  }

  test("int8 encode/decode error stays below one quantization step") {
    val st = StorageCompression.int8Stats(emb, "embedding").head()
    val scale = st.getDouble(1)
    val maxErr = emb
      .crossJoin(broadcast(StorageCompression.int8Stats(emb, "embedding")))
      .selectExpr(s"${StorageCompression.int8EncodeExpr("embedding")} as code",
        "mn", "scale", "embedding")
      .selectExpr(
        s"""array_max(zip_with(${StorageCompression.int8DecodeExpr("code")},
           |  embedding, (d, o) -> abs(d - cast(o as double)))) as err""".stripMargin)
      .agg(max("err")).head().getDouble(0)
    assert(maxErr <= scale, s"int8 max err $maxErr > scale $scale")
    // codes occupy the full uint8 domain
    val codes = emb
      .crossJoin(broadcast(StorageCompression.int8Stats(emb, "embedding")))
      .selectExpr(s"${StorageCompression.int8EncodeExpr("embedding")} as code")
      .selectExpr("array_min(code) as lo", "array_max(code) as hi")
      .agg(min("lo"), max("hi")).head()
    assert(codes.getInt(0) >= 0 && codes.getInt(1) <= 255)
  }
}
