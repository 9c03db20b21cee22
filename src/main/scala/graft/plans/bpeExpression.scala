package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer: encode text against a learned merge
  * table (Sennrich/Haddow/Birch, "Neural Machine Translation of Rare
  * Words with Subword Units", ACL'16 — the original BPE-encode
  * procedure: apply each merge operation in learning order). The real
  * token-count primitive for a training-data pipeline — sequence packing,
  * mixture budgeting, and curriculum buckets all key on BPE token counts,
  * not whitespace words.
  *
  * Semantics per word (whitespace-delimited, per Character.isWhitespace):
  * symbols start as code points; for each merge rule "a b" in table
  * order, one left-to-right pass fuses every adjacent (a, b) into "ab".
  * One pass per rule IS that rule's fixpoint: fusing (a, b) can only
  * create neighbors (x, ab) and (ab, y), and "ab" is strictly longer
  * than b, so a new (a, b) adjacency can never appear. This sequential
  * formulation (rather than the equivalent min-rank loop used by GPT-2's
  * encoder, which is an optimization for tables closed under learning
  * order) is also expressible as iterated string replaces — which is how
  * the SQL oracle cross-checks it.
  *
  * The merge table is a plan-time constant (like SignLshBucketExpr's
  * nBits): parsed once per executor, shared across rows via the codegen
  * reference object — no per-row parsing, no UDF closure capture.
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[String],
                         marker: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes = Seq[DataType](StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  @transient private lazy val table: BpeEncodeExpr.MergeTable =
    BpeEncodeExpr.parse(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeEncodeExpr.encode(input.asInstanceOf[UTF8String], table, marker)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("bpeMerges", table,
      classOf[BpeEncodeExpr.MergeTable].getName)
    defineCodeGen(ctx, ev, c =>
      "graft.plans.BpeEncodeExpr$.MODULE$.encode(" + c + ", " + t + ", " + marker + ")")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

/** Training-side companion of BpeEncodeExpr: the within-word adjacent
  * token pairs of `text` under the CURRENT merge table — the rows a BPE
  * trainer counts to pick the next merges. The merge table is a runtime
  * ARRAY<STRING> column here (it grows per training round, so it cannot
  * be a plan-time constant); it is parsed per evaluation, which is fine
  * for the training loop's scale — vocab learning runs on a corpus
  * sample, and the per-eval parse is O(current rules). Production encode
  * uses BpeEncodeExpr with the learned table as a constant. Pairs stay
  * WITHIN words: cross-word adjacencies are never emitted because encode
  * could never merge them. */
case class BpePairsExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes = Seq[DataType](StringType, ArrayType(StringType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_pairs"

  override protected def nullSafeEval(text: Any, merges: Any): Any =
    BpeEncodeExpr.pairs(text.asInstanceOf[UTF8String],
      merges.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, m) =>
      "graft.plans.BpeEncodeExpr$.MODULE$.pairs(" + t + ", " + m + ")")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BpePairsExpr =
    copy(left = l, right = r)
}

object BpeEncodeExpr {

  /** Parsed merge rules in application order (parallel arrays — compact,
    * serializable, cheap to index from generated code). */
  final class MergeTable(val left: Array[String], val right: Array[String])
      extends Serializable

  def parse(merges: Seq[String]): MergeTable = {
    val l = new Array[String](merges.length)
    val r = new Array[String](merges.length)
    var i = 0
    merges.foreach { m =>
      val sp = m.indexOf(' ')
      require(sp > 0 && sp < m.length - 1 && m.indexOf(' ', sp + 1) < 0,
        s"""merge rule must be "left right", got "$m"""")
      l(i) = m.substring(0, sp)
      r(i) = m.substring(sp + 1)
      i += 1
    }
    new MergeTable(l, r)
  }

  def parseArray(merges: org.apache.spark.sql.catalyst.util.ArrayData): MergeTable = {
    val n = merges.numElements()
    val rules = new Array[String](n)
    var i = 0
    while (i < n) { rules(i) = merges.getUTF8String(i).toString; i += 1 }
    parse(rules.toIndexedSeq)
  }

  /** SentencePiece-style word-boundary marker for the reversible mode:
    * prefixes each word's FIRST token. The marker is annotation added
    * AFTER merging (merges operate on un-marked symbols), so the token
    * stream under marker=true is the marker=false stream with boundaries
    * made explicit — and bpe_decode can reconstruct single-space-
    * normalized text exactly. Input text must not contain the marker
    * char itself (the standard SentencePiece assumption). */
  val Marker = "▁"

  def encode(text: UTF8String, t: MergeTable, marker: Boolean): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    eachWord(text.toString, t) { (syms, n) =>
      var k = 0
      while (k < n) {
        out += UTF8String.fromString(
          if (marker && k == 0) Marker + syms(0) else syms(k))
        k += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Within-word adjacent token pairs ("a b" rows) under merge table `m`. */
  def pairs(text: UTF8String,
            m: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData = {
    val t = parseArray(m)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    eachWord(text.toString, t) { (syms, n) =>
      var k = 0
      while (k < n - 1) {
        out += UTF8String.fromString(syms(k) + " " + syms(k + 1)); k += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Tokenize each whitespace-delimited word of `s` and hand the merged
    * symbol array (first n slots valid) to `f`. */
  private def eachWord(s: String, t: MergeTable)(f: (Array[String], Int) => Unit): Unit = {
    var i = 0
    while (i < s.length) {
      while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < s.length && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) {
        val (syms, n) = mergeWord(s, start, i, t)
        f(syms, n)
      }
    }
  }

  private def mergeWord(s: String, from: Int, until: Int,
                        t: MergeTable): (Array[String], Int) = {
    // initial symbols: one per code point
    val syms = new Array[String](until - from)
    var n = 0
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      syms(n) = s.substring(i, i + w)
      n += 1
      i += w
    }
    // apply each rule once, left-to-right, compacting in place
    var m = 0
    while (m < t.left.length && n > 1) {
      val a = t.left(m)
      val b = t.right(m)
      var j = 0
      var w = 0
      while (j < n) {
        if (j + 1 < n && syms(j) == a && syms(j + 1) == b) {
          syms(w) = a + b; j += 2
        } else {
          syms(w) = syms(j); j += 1
        }
        w += 1
      }
      n = w
      m += 1
    }
    (syms, n)
  }
}
