package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass rolling character hash — the codegen kernel form of
  * [[graft.text.TextAnalysis.charHash]]'s fold
  * `(acc · CharB + codepoint) % HashM` over a string's code points.
  *
  * The SQL-expression form (`aggregate(transform(sequence(1, length(t)),
  * i -> ascii(substring(t, i, 1))), …)`) re-slices the string per
  * character — `substring` walks from the front each call, so one
  * evaluation is O(n²) with a per-character UTF8String allocation, all
  * on the interpreted higher-order path. Measured on `embed_cached`
  * (sf0.1, ~300-char docs keyed 3× per run): 7.6 s warm → this kernel
  * walks the UTF-8 bytes once, decoding code points in place. Same
  * value as the SQL form and as DuckDB's
  * `ascii(substr(t, i, 1))` twin on every code point (DuckDB's ascii
  * returns the code point; for the ASCII corpus all three folds agree
  * byte-for-byte, and the byte decoder keeps parity with DuckDB beyond
  * ASCII).
  *
  * Reference context: the content key of the reference's CachedEmbedder
  * (`embeddings.py:374-448`, sha256 over the text) — the engine's
  * deterministic stand-in hash, shared by the hash embedder's text key.
  */
object CharHashKernel {
  import graft.text.TextAnalysis.{CharB, HashM}

  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      var cp = 0
      var len = 1
      if (b < 0x80) cp = b
      else if ((b & 0xe0) == 0xc0) { cp = b & 0x1f; len = 2 }
      else if ((b & 0xf0) == 0xe0) { cp = b & 0x0f; len = 3 }
      else { cp = b & 0x07; len = 4 }
      var j = 1
      while (j < len && i + j < bytes.length) {
        cp = (cp << 6) | (bytes(i + j) & 0x3f)
        j += 1
      }
      acc = (acc * CharB + cp) % HashM
      i += len
    }
    acc
  }
}

case class CharHash(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_charhash"
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName: unsupported input $other")
    }

  override def nullSafeEval(v: Any): Any =
    CharHashKernel.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.CharHashKernel.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): CharHash =
    copy(child = newChild)
}
