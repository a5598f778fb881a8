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
    // Text-pipeline kernels as SQL functions. Each kernel is already a
    // pure Spark-SQL expression string (that's what makes the DuckDB
    // oracles possible), so the registration parses that string into a
    // Catalyst tree and splices the caller's argument in — the result
    // is built-ins + higher-order lambdas, fully codegen'd, no UDF.
    import graft.text.TextAnalysis
    ext.injectFunction(kernelFn("graft_word_tokens",
      "graft_word_tokens(text) - lowercased \\w+ tokens",
      TextAnalysis.wordTokens))
    ext.injectFunction(kernelFn("graft_token_count",
      "graft_token_count(text) - word-token count",
      t => s"size(${TextAnalysis.wordTokens(t)})"))
    ext.injectFunction(kernelFn("graft_stopword_ratio",
      "graft_stopword_ratio(text) - stopword fraction of word tokens",
      TextAnalysis.stopwordRatioStr))
    ext.injectFunction(kernelFn("graft_quality",
      "graft_quality(text) - composite [0,1] quality score",
      TextAnalysis.qualityScoreStr))
    ext.injectFunction(kernelFn("graft_langid",
      "graft_langid(text) - marker-token language id ('und' if none)",
      TextAnalysis.langIdStr))
    ext.injectFunction(kernelFn("graft_fingerprint",
      "graft_fingerprint(text) - order-sensitive rolling-hash fingerprint",
      TextAnalysis.fingerprintStr))
    // index-aware ORDER BY vec_cosine_distance(...) LIMIT k: tables
    // registered in graft.plans.IndexedTables serve top-k from their
    // persistent LSH index (probe + rerank) instead of a full scan
    ext.injectOptimizerRule(s => graft.plans.AnnTopKRewrite(s))
  }

  /** Parse a single-argument kernel's Spark-SQL form with a placeholder
    * attribute and splice the call-site argument expression in. */
  private def kernelFn(name: String, usage: String, sqlOf: String => String)
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    fn(name, usage, es => {
      if (es.length != 1) throw new IllegalArgumentException(
        s"$name expects exactly 1 argument, got ${es.length}")
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(sqlOf(KernelArg)).transformUp {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if a.nameParts == Seq(KernelArg) => es.head
        }
    })

  private val KernelArg = "__graft_arg"
}
