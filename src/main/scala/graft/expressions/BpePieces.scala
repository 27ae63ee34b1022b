package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge-table APPLICATION (the encoder): segment a document's
  * whitespace words into subword pieces by applying a trained merge
  * table (Sennrich et al. 2016 semantics — rules in training-rank
  * order, each replacing leftmost-first non-overlapping adjacent
  * occurrences; merging "a a" over "a a a" yields ["aa","a"]).
  *
  * One narrow expression per row — encoding runs at scan speed with no
  * shuffle and no join-back. The "encode each distinct word once"
  * economy comes from a per-expression-instance memo table (bounded;
  * cleared when it hits [[BpePieces.MemoCap]]): a corpus's word
  * distribution is Zipfian, so virtually every occurrence after the
  * first per executor is a hash lookup, the same win the word-freq
  * collapse gives [[graft.ops.Vocab.bpeTrain]] without materializing a
  * distinct-word frame.
  *
  * The merge table is bounded (a trained artifact, pinned at
  * tokenizer-release time like production pipelines pin a tokenizer)
  * and rides inside the expression as a literal — metadata-scale,
  * broadcast with the plan. [[graft.ops.Vocab.bpeEncodeFold]] is the
  * composed-built-ins reference form (a replace() fold over a
  * U+001F-framed representation), asserted equal in specs and mirrored
  * verbatim by the DuckDB oracle.
  */
case class BpePieces(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(s"bpe_pieces needs string, got $t")
    }

  @transient private lazy val memo =
    new java.util.HashMap[String, Array[String]]()

  private def encodeWord(word: String): Array[String] = {
    val hit = memo.get(word)
    if (hit != null) return hit
    // start from single code points
    var syms = {
      val b = Array.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        val n = Character.charCount(cp)
        b += word.substring(i, i + n)
        i += n
      }
      b.result()
    }
    // rules in rank order; leftmost-first non-overlapping per rule
    merges.foreach { case (a, b) =>
      if (syms.length > 1) {
        val out = Array.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b
            i += 2
          } else {
            out += syms(i)
            i += 1
          }
        }
        syms = out.result()
      }
    }
    if (memo.size >= BpePieces.MemoCap) memo.clear()
    memo.put(word, syms)
    syms
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString.trim
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val words = s.split("\\s+")
    val out = Array.newBuilder[Any]
    var w = 0
    while (w < words.length) {
      val pieces = encodeWord(words(w))
      var i = 0
      while (i < pieces.length) {
        out += UTF8String.fromString(pieces(i))
        i += 1
      }
      w += 1
    }
    new GenericArrayData(out.result())
  }

  override def prettyName: String = "bpe_pieces"

  override protected def withNewChildInternal(newChild: Expression): BpePieces =
    copy(child = newChild)
}

object BpePieces {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Memo entries per expression instance before a reset — bounds
    * executor memory at ~a few MB regardless of corpus size. */
  val MemoCap = 1 << 16

  def apply(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpePieces(Bridge.expression(text), merges))
}
