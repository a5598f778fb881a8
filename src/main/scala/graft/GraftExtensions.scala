package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expr.{CosineDistance, DotProduct, Fp16Decode, Fp16Encode, L2Distance}

/** Session extension wiring for the graft kernels — lets any Spark app
  * (or `spark-sql` / thrift server) load the engine's native functions
  * with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * or `SparkSession.builder.withExtensions(new GraftExtensions)`. The
  * distance kernels then work from plain SQL:
  *
  *   SELECT id FROM t ORDER BY vec_cosine_distance(embedding, q) LIMIT 10
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(
      name: String, usage: String,
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("vec_dot",
      "vec_dot(a, b) - dot product of two float/double arrays",
      es => DotProduct(es(0), es(1))))
    ext.injectFunction(fn("vec_cosine_distance",
      "vec_cosine_distance(a, b) - 1 - cos(a, b); lower = more similar",
      es => CosineDistance(es(0), es(1))))
    ext.injectFunction(fn("vec_l2_distance",
      "vec_l2_distance(a, b) - euclidean distance",
      es => L2Distance(es(0), es(1))))
    ext.injectFunction(fn("vec_ip_distance",
      "vec_ip_distance(a, b) - negated dot product; lower = more similar",
      es => org.apache.spark.sql.catalyst.expressions.UnaryMinus(
        DotProduct(es(0), es(1)))))
    ext.injectFunction(fn("fp16_encode",
      "fp16_encode(vec) - IEEE binary16 bit patterns as array<smallint>",
      es => Fp16Encode(es(0))))
    ext.injectFunction(fn("fp16_decode",
      "fp16_decode(codes) - array<float> from binary16 bit patterns",
      es => Fp16Decode(es(0))))
    // index-aware ORDER BY vec_cosine_distance(...) LIMIT k: tables
    // registered in graft.plans.IndexedTables serve top-k from their
    // persistent LSH index (probe + rerank) instead of a full scan
    ext.injectOptimizerRule(s => graft.plans.AnnTopKRewrite(s))
  }
}
