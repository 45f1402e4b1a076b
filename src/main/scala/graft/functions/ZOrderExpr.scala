package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two non-negative long keys — the
  * multi-dimensional clustering key behind Iceberg/Delta `ZORDER BY`
  * data layout: sorting (or range-bucketing) rows by the interleaved
  * key keeps BOTH dimensions' min/max ranges narrow within every file,
  * so a scan predicate on EITHER column prunes most files from the
  * manifest stats, where a plain lexicographic sort only ever prunes
  * on its leading column.
  *
  * Bit i of `left` lands at result bit 2i, bit i of `right` at 2i+1;
  * only the low `bits` bits of each input participate (callers
  * normalize keys into [0, 2^bits) first — see
  * [[graft.datatools.Layout.zorderBuckets]]). The spread uses the
  * classic mask-doubling sequence (Morton 1966; "Bit Twiddling Hacks",
  * Anderson), five shift-and-mask steps per side, branch-free, fused
  * into whole-stage codegen — no UDF serde, no per-row allocation.
  *
  * Reference analog: the engine's store layer is spec'd over Iceberg
  * (SURVEY.md §1.3); z-order is the layout optimization that makes
  * its metadata min/max pruning effective on more than one column.
  */
case class ZOrderExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with Serializable {

  require(bits >= 1 && bits <= 32, s"bits must be in [1,32], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder requires (bigint, bigint), got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderExpr.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("zx")
      val y = ctx.freshName("zy")
      val mask = s"((${bits} == 32) ? 0xFFFFFFFFL : ((1L << ${bits}) - 1L))"
      // the same mask-doubling spread as ZOrderExpr.spread, inlined so
      // the whole computation stays inside the generated projection
      def spread(v: String): String =
        s"""$v = ($v | ($v << 16)) & 0x0000FFFF0000FFFFL;
           |$v = ($v | ($v << 8))  & 0x00FF00FF00FF00FFL;
           |$v = ($v | ($v << 4))  & 0x0F0F0F0F0F0F0F0FL;
           |$v = ($v | ($v << 2))  & 0x3333333333333333L;
           |$v = ($v | ($v << 1))  & 0x5555555555555555L;""".stripMargin
      s"""
         |long $x = $a & $mask;
         |long $y = $b & $mask;
         |${spread(x)}
         |${spread(y)}
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "zorder"
}

object ZOrderExpr {

  /** Spread the low 32 bits of `v` to the even bit positions. */
  @inline def spread(v0: Long): Long = {
    var v = v0
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton interleave of the low `bits` bits of `a` (even positions)
    * and `b` (odd positions).
    */
  def interleave(a: Long, b: Long, bits: Int): Long = {
    val mask = if (bits == 32) 0xFFFFFFFFL else (1L << bits) - 1L
    spread(a & mask) | (spread(b & mask) << 1)
  }

  /** Column API: both sides cast to bigint first. */
  def zorder(a: Column, b: Column, bits: Int): Column =
    GraftBridge.column(ZOrderExpr(
      GraftBridge.expression(a.cast("bigint")),
      GraftBridge.expression(b.cast("bigint")), bits))
}
