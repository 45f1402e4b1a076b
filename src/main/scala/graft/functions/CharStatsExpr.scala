package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-distribution statistics in ONE fused pass per document —
  * the gibberish / encoding-noise quality signal (complementing the
  * token-level signals of `TextAnalysis.qualityScore` and the n-gram
  * repetition fractions of `repetitionSignals`): a document whose
  * character distribution is concentrated on a handful of symbols
  * (binary spill, padding runs, single-char floods) scores near 10⁶;
  * natural text sits far lower. All integer arithmetic so the DuckDB
  * oracle replays every bit — no float entropy whose summation order
  * could flip a rounded digit:
  *
  *   - `n_chars`        — total count
  *   - `distinct_chars` — support size
  *   - `simpson_ppm`    — Simpson concentration Σ(c/n)² in ppm,
  *     computed as `(Σc² · 10⁶) div n²`; the Gini–Simpson diversity is
  *     `1 − simpson_ppm/10⁶`. Empty text is pinned to (0, 0, 10⁶) —
  *     degenerate maximal concentration, junk by convention.
  *
  * Counting is over UNICODE CODE POINTS — the raw UTF-8 bytes are
  * walked with `UTF8String.numBytesForFirstByte` (the CdcExprs
  * discipline), so the contract matches the column names on any
  * corpus, not just ASCII. Code points < 256 count in a fixed 256-slot
  * histogram (zero allocation on ASCII/Latin-1 text — the hot path);
  * wider code points spill to a map allocated lazily and bounded by
  * the document's distinct characters. Malformed bytes count as
  * single Latin-1 code points (deterministic, never thrown). The
  * DuckDB twin splits into characters, which equals code points for
  * any text without combining sequences — and exactly, byte for byte,
  * on the synthetic corpus the q119 oracle is hashed over.
  *
  * `Σc² · 10⁶` stays inside a signed 64 for documents up to ~3 MB of
  * a single repeated character (n² ≤ 9.2·10¹²); beyond that the
  * arithmetic switches to an exact BigInt fallback instead of
  * overflowing into a negative concentration (the bound is enforced,
  * not just documented).
  */
object CharStatsExprs {

  def charStats(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    if (bytes.length == 0)
      return new GenericInternalRow(Array[Any](0L, 0L, 1000000L))
    val counts = new Array[Long](256)
    var wide: java.util.HashMap[Integer, Array[Long]] = null
    var n = 0L
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i)
      val len = UTF8String.numBytesForFirstByte(b0)
      var cp =
        if (len == 1) b0 & 0xff // ASCII, or a malformed byte as Latin-1
        else b0 & ((1 << (7 - len)) - 1)
      var k = 1
      while (k < len && i + k < bytes.length) {
        cp = (cp << 6) | (bytes(i + k) & 0x3f)
        k += 1
      }
      if (cp < 256) counts(cp) += 1L
      else {
        if (wide == null) wide = new java.util.HashMap[Integer, Array[Long]]()
        val slot = wide.get(cp)
        if (slot == null) wide.put(cp, Array(1L)) else slot(0) += 1L
      }
      n += 1L
      i += len
    }
    var distinct = 0L
    var ss = 0L
    var b = 0
    while (b < 256) {
      val c = counts(b)
      if (c > 0L) { distinct += 1L; ss += c * c }
      b += 1
    }
    if (wide != null) {
      distinct += wide.size.toLong
      val it = wide.values().iterator()
      while (it.hasNext) { val c = it.next()(0); ss += c * c }
    }
    val simpson =
      if (ss <= Long.MaxValue / 1000000L) ss * 1000000L / (n * n)
      else (BigInt(ss) * 1000000 / (BigInt(n) * BigInt(n))).toLong
    new GenericInternalRow(Array[Any](n, distinct, simpson))
  }

  def charStatsCol(text: Column): Column =
    GraftBridge.column(CharStatsExpr(GraftBridge.expression(text)))
}

/** text → struct(n_chars, distinct_chars, simpson_ppm) — see
  * [[CharStatsExprs.charStats]]; the histogram loop runs inside
  * WholeStageCodegen like the sketch expressions it sits beside.
  */
case class CharStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false),
    StructField("simpson_ppm", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    CharStatsExprs.charStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharStatsExprs.charStats($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "char_stats"
}
