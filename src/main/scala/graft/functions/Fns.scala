package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar/aggregate building blocks shared by the query surface.
  *
  * Numerical determinism contract: any aggregate over doubles that must
  * hash-match an external engine (the DuckDB oracle) is quantized first —
  * `floor(x * scale + 0.5)` evaluated in IEEE double (identical in every
  * engine), then summed as exact 64-bit integers (associative, so the
  * result is independent of Spark's partition/merge order), then divided
  * back by `scale` as one IEEE division. Plain `sum(double)` is
  * order-dependent and would flap the oracle hash run-to-run; a
  * double->decimal CAST is engine-implementation-defined in its rounding
  * (observed: DuckDB and Spark disagree at scale 12) — the explicit
  * floor-quantization is the only formulation both engines compute
  * bit-identically.
  */
object Fns {

  /** Micro-unit quantization scale: 6 fractional digits survives the round
    * trip for business values up to ~9e12 (long holds scale*sum < 2^63). */
  val QScale = 1e6

  /** Order-independent, engine-portable double sum (see class doc). */
  def dsum(c: Column, scale: Double = QScale): Column =
    sum(floor(c * lit(scale) + lit(0.5)).cast(LongType)) / lit(scale)

  /** Order-independent double mean: quantized sum / count, one IEEE div. */
  def davg(c: Column, scale: Double = QScale): Column = dsum(c, scale) / count(c)

  /** Dollars (double) -> integer cents, half-up.
    * Reference: `starter:etl/transform.py:14-20` (`cents_from_price`) uses
    * Python round() (half-even); we deliberately use half-up via
    * floor(x*100+0.5) because it is expressible identically in every SQL
    * engine — documented deviation (SURVEY.md §7.4).
    */
  def cents(dollars: Column): Column =
    floor(dollars * lit(100) + lit(0.5)).cast(LongType)

  /** Integer cents -> "$D.CC" display string, sign-prefix form for
    * negatives ("-$2.50") — normalized with the native FormatMoney
    * expression and the oracle SQL (PropertySpec holds the three-way law).
    * Reference: `app/api.py:61-64` (`cents_to_price`; reference renders
    * positive catalog prices only, so the negative form is ours to define).
    */
  def priceDisplay(cents: Column): Column = {
    val a = abs(cents)
    concat(
      when(cents < 0, lit("-")).otherwise(lit("")),
      lit("$"),
      (a / lit(100)).cast(LongType).cast(StringType),
      lit("."),
      lpad(pmod(a, lit(100)).cast(StringType), 2, "0"))
  }

  /** Date -> "YYYY-MM-DD" (reference `app/api.py:144` isoformat render). */
  def isoDate(d: Column): Column = date_format(d, "yyyy-MM-dd")

  /** Case/whitespace normalization (reference `starter:etl/transform.py:43-45`). */
  def norm(c: Column): Column = lower(trim(c))

  /** Weighted multi-field relevance score — the reference's client-side
    * search scoring (`app/templates/search.html:177-187`): substring hit in
    * field i adds weight_i. */
  def relevance(q: String, fields: Seq[(Column, Int)]): Column =
    fields.map { case (c, w) =>
      when(lower(c).contains(lit(q.toLowerCase)), lit(w)).otherwise(lit(0))
    }.reduce(_ + _).cast(IntegerType)

  /** Tokenize on single spaces (documents fixture is single-space separated). */
  def toks(c: Column): Column = split(c, " ")

  /** Whitespace token count without split/explode — identical arithmetic in
    * any engine: #separators + 1. */
  def tokenCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, " ", "")) + lit(1)).cast(LongType)

  /** X14 HTML escape (reference `app/templates/search.html:174`
    * `escapeHTML`): & < > " ' -> entities. Chained codegen'd replace()s —
    * `&` first so entity ampersands are not double-escaped. */
  def htmlEscape(c: Column): Column =
    Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;",
        "\"" -> "&quot;", "'" -> "&#039;")
      .foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }

  /** X13 image-URL extension swap (reference `app/templates/search.html:70-75`:
    * strip a trailing .png/.jpg/.jpeg/.webp, then try each fallback
    * extension). `swapExt` rewrites to one extension; `extCandidates`
    * yields the reference's full fallback candidate list. */
  def swapExt(url: Column, ext: String): Column =
    concat(regexp_replace(url, "(?i)\\.(png|jpg|jpeg|webp)$", ""), lit(s".$ext"))

  def extCandidates(url: Column): Column =
    array(Seq("jpg", "jpeg", "png", "webp").map(e => swapExt(url, e)): _*)
}
