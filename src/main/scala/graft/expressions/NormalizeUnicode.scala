package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization to a canonical/compatibility form
  * (NFC/NFD/NFKC/NFKD) via `java.text.Normalizer` — the text-canonical
  * step a web corpus needs before dedup and tokenization: without it
  * visually-identical strings ("é" composed vs "e"+combining-acute,
  * fullwidth "Ａ" vs "A", the "ﬁ" ligature vs "fi") hash differently,
  * so exact dedup misses duplicates and the tokenizer vocabulary
  * fragments. NFKC (compatibility compose) is the training-pipeline
  * convention; NFC is the canonical-only form DuckDB's
  * `nfc_normalize` implements, which the oracle gate uses.
  *
  * Fast path: `Normalizer.isNormalized` on the already-normalized
  * common case (ASCII web text) avoids the allocation entirely —
  * at 100 TB most rows take this branch and the expression is a
  * single scan over the UTF-16 chars.
  */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val nf = Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if Set("NFC", "NFD", "NFKC", "NFKD")(form) =>
        TypeCheckResult.TypeCheckSuccess
      case StringType =>
        TypeCheckResult.TypeCheckFailure(
          s"normalize form must be NFC/NFD/NFKC/NFKD, got $form")
      case t =>
        TypeCheckResult.TypeCheckFailure(s"normalize needs string, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, nf)) input
    else UTF8String.fromString(Normalizer.normalize(s, nf))
  }

  override def prettyName: String = "normalize_unicode"

  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicode =
    copy(child = newChild)
}

object NormalizeUnicode {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(text: Column, form: String): Column =
    Bridge.column(NormalizeUnicode(Bridge.expression(text), form))
}
