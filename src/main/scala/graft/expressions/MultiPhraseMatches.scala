package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All phrases from a fixed list that occur as substrings of the input,
  * in one pass over the text — Aho–Corasick multi-pattern matching
  * (Aho & Corasick, CACM 1975), the blocklist/flaglist screen of a
  * training-data pipeline (NSFW terms, boilerplate markers, policy
  * phrases).
  *
  * Why an expression and not composed built-ins: the composed form is
  * P `contains()` probes per row — O(|text|·P) work and P codegen'd
  * branches, which at a 10⁴-phrase blocklist over 100 TB of text IS
  * the job. The automaton is built once per task (transient lazy),
  * shared across rows, and scans each document in O(|text| + matches)
  * regardless of P.
  *
  * Output: the matched phrases in PHRASE-LIST ORDER, each at most once
  * (array<string>) — deterministic, so a SQL oracle's
  * `list_filter(phrases, p -> contains(text, p))` reproduces it
  * exactly. Matching is case-sensitive raw-codeunit equality (callers
  * lowercase/normalize both sides upstream — see
  * [[graft.functions.TextFunctions]]). */
case class MultiPhraseMatches(child: Expression, phrases: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType =>
        if (phrases.isEmpty)
          TypeCheckResult.TypeCheckFailure("phrase list must be non-empty")
        else if (phrases.exists(p => p == null || p.isEmpty))
          TypeCheckResult.TypeCheckFailure("phrases must be non-empty strings")
        else TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"multi_match needs string input, got $t")
    }

  // ---- Aho–Corasick automaton over UTF-16 code units ----
  // Built once per deserialized expression instance (one per task);
  // goto is a per-node char map (blocklists are sparse tries — a dense
  // char-indexed array would be 64 KB per node).
  @transient private lazy val automaton: Automaton = {
    val ps = phrases.toArray
    // trie
    val gotoMaps = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outIdx = scala.collection.mutable.ArrayBuffer(
      List.empty[Int])
    ps.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { c =>
        val nxt = gotoMaps(node).get(c)
        node = if (nxt != null) nxt.intValue()
        else {
          gotoMaps += new java.util.HashMap[Character, Integer]()
          outIdx += Nil
          val id = gotoMaps.length - 1
          gotoMaps(node).put(c, id)
          id
        }
      }
      outIdx(node) = pi :: outIdx(node)
    }
    // failure links via BFS; out sets absorb the fail node's outs
    val fail = new Array[Int](gotoMaps.length)
    val queue = new java.util.ArrayDeque[Integer]()
    gotoMaps(0).forEach { (_, v) => fail(v) = 0; queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      gotoMaps(u).forEach { (c, v) =>
        queue.add(v)
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).containsKey(c)) f = fail(f)
        val tgt = gotoMaps(f).get(c)
        fail(v) = if (tgt != null && tgt.intValue() != v.intValue())
          tgt.intValue() else 0
        outIdx(v) = outIdx(v) ++ outIdx(fail(v))
      }
    }
    Automaton(gotoMaps.map(identity).toArray, fail,
      outIdx.map(_.toArray).toArray, ps)
  }

  private case class Automaton(
      gotoMaps: Array[java.util.HashMap[Character, Integer]],
      fail: Array[Int], out: Array[Array[Int]], phraseArr: Array[String])

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val a = automaton
    val hit = new java.util.BitSet(a.phraseArr.length)
    var node = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var n = node
      while (n != 0 && !a.gotoMaps(n).containsKey(c)) n = a.fail(n)
      val nxt = a.gotoMaps(n).get(c)
      node = if (nxt != null) nxt.intValue() else 0
      val outs = a.out(node)
      var j = 0
      while (j < outs.length) { hit.set(outs(j)); j += 1 }
      i += 1
    }
    // matched phrases in phrase-list order
    val res = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var b = hit.nextSetBit(0)
    while (b >= 0) {
      res += UTF8String.fromString(a.phraseArr(b))
      b = hit.nextSetBit(b + 1)
    }
    new GenericArrayData(res.toArray[Any])
  }

  override def prettyName: String = "multi_match"

  override protected def withNewChildInternal(
      newChild: Expression): MultiPhraseMatches = copy(child = newChild)
}

object MultiPhraseMatches {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(text: Column, phrases: Seq[String]): Column =
    Bridge.column(MultiPhraseMatches(Bridge.expression(text), phrases))
}
