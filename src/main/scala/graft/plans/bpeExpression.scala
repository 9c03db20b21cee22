package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
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
case class BpeEncodeExpr(child: Expression, merges: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes = Seq[DataType](StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  @transient private lazy val table: BpeEncodeExpr.MergeTable =
    BpeEncodeExpr.parse(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeEncodeExpr.encode(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("bpeMerges", table,
      classOf[BpeEncodeExpr.MergeTable].getName)
    defineCodeGen(ctx, ev, c =>
      "graft.plans.BpeEncodeExpr$.MODULE$.encode(" + c + ", " + t + ")")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
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

  def encode(text: UTF8String, t: MergeTable): GenericArrayData = {
    val s = text.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < s.length) {
      while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < s.length && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) encodeWord(s, start, i, t, out)
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(s: String, from: Int, until: Int, t: MergeTable,
                         out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
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
    var k = 0
    while (k < n) { out += UTF8String.fromString(syms(k)); k += 1 }
  }
}
