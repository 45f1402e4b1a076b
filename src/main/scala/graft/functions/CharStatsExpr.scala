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
  * repetition fractions of `repetitionSignals`): a document whose byte
  * distribution is concentrated on a handful of symbols (binary spill,
  * padding runs, single-char floods) scores near 10⁶; natural text
  * sits far lower. All integer arithmetic so the DuckDB oracle replays
  * every bit — no float entropy whose summation order could flip a
  * rounded digit:
  *
  *   - `n_chars`        — total count
  *   - `distinct_chars` — support size
  *   - `simpson_ppm`    — Simpson concentration Σ(c/n)² in ppm,
  *     computed as `(Σc² · 10⁶) div n²`; the Gini–Simpson diversity is
  *     `1 − simpson_ppm/10⁶`. Empty text is pinned to (0, 0, 10⁶) —
  *     degenerate maximal concentration, junk by convention.
  *
  * Counting is over UTF-8 BYTES (a bounded 256-slot histogram, no
  * per-row map allocation); on ASCII text — all of the synthetic
  * corpus — bytes and characters coincide, which is what makes the
  * char-level DuckDB twin exact. `Σc² · 10⁶` stays inside a signed 64
  * for documents up to ~3 MB (n² ≤ 9·10¹²) — far above the corpus and
  * the same bound the BIGINT oracle has.
  */
object CharStatsExprs {

  def charStats(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length.toLong
    if (n == 0L)
      return new GenericInternalRow(Array[Any](0L, 0L, 1000000L))
    val counts = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { counts(bytes(i) & 0xff) += 1L; i += 1 }
    var distinct = 0L
    var ss = 0L
    var b = 0
    while (b < 256) {
      val c = counts(b)
      if (c > 0L) { distinct += 1L; ss += c * c }
      b += 1
    }
    new GenericInternalRow(Array[Any](n, distinct, ss * 1000000L / (n * n)))
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
