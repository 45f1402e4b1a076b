package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** 8-bit scalar quantization ROUND-TRIP of an `array<double>` vector —
  * models the storage format of an SQ8-compressed IVF list (1 byte per
  * dim + per-vector (min, scale), an 8× payload reduction over float64;
  * the probed-list scan sees the dequantized values this expression
  * returns).
  *
  * Per vector: `scale = (max - min) / 255`; each element quantizes to
  * `q = floor((x - min)/scale + 0.5)` and dequantizes to
  * `min + q·scale` (a degenerate all-equal vector has scale 0 and
  * round-trips to `min`). Every step is a plain IEEE double op —
  * subtract, divide, floor, multiply, add — so the DuckDB oracle twin
  * (`list_transform` over the same formula) is bit-identical with no
  * decimal-representation subtleties (`floor(y + 0.5)` deliberately,
  * NOT a decimal `round`). A null element yields null (the
  * [[CosineSimilarityExpr]] convention).
  */
object Sq8Exprs {

  def roundTrip(vec: ArrayData): GenericArrayData = {
    val n = vec.numElements()
    var i = 0
    while (i < n) { if (vec.isNullAt(i)) return null; i += 1 }
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    i = 0
    while (i < n) {
      val x = vec.getDouble(i)
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    val scale = (mx - mn) / 255.0
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) =
        if (scale == 0.0) mn
        else mn + math.floor((vec.getDouble(i) - mn) / scale + 0.5) * scale
      i += 1
    }
    new GenericArrayData(out)
  }

  def roundTripCol(vec: Column): Column =
    GraftBridge.column(Sq8RoundTripExpr(GraftBridge.expression(vec.cast("array<double>"))))
}

/** array<double> → array<double> after an SQ8 quantize/dequantize pass. */
case class Sq8RoundTripExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true // null input OR null element
  override def nullSafeEval(input: Any): Any =
    Sq8Exprs.roundTrip(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  graft.functions.Sq8Exprs.roundTrip($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "sq8_round_trip"
}
