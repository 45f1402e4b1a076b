package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native hyperplane-LSH bucket signature — the codegen replacement for
  * the `element_at(v,1)*s1 + element_at(v,2)*s2 + …` Column stack in
  * `datatools/Dedup.hyperplaneSignature`. The Column form inlines
  * `dim × planes` expression NODES per table (6 tables × 4 planes ×
  * 64 dims = 1 536 leaves for q27), which bloats the serialized task
  * binary to multiple MiB and evaluates an interpreted tree per row;
  * this expression carries the ±1 sign matrix as ONE reference object
  * and runs a fused double loop inside whole-stage codegen.
  *
  * Bit-for-bit parity with the Column stack (and therefore with the
  * DuckDB oracle twin that inlines the same signs): the dot product
  * accumulates strictly left-to-right in plane-major order, and the
  * bit is `dot > 0` — NaN and zero both yield '0', exactly like
  * `when(dot > 0, 1).otherwise(0)`. Pinned by DatatoolsSpec.
  */
object HyperplaneExprs {

  /** `signs` is plane-major flattened: plane p's weights occupy
    * `[p*dim, (p+1)*dim)`.
    *
    * Degenerate inputs take the Column-stack twin's semantics: a null
    * element anywhere in `[0, dim)` null-propagates through every
    * plane's dot product, and `when(null > 0, 1).otherwise(0)` lands on
    * '0' — so any null element (or a vector shorter than `dim`, whose
    * missing `element_at` reads are null) yields the all-'0' bucket
    * instead of silently treating nulls as 0.0 or throwing
    * ArrayIndexOutOfBounds.
    */
  def signature(vec: ArrayData, signs: Array[Double], planes: Int, dim: Int): UTF8String = {
    val out = new Array[Byte](planes)
    if (vec.numElements() < dim) {
      java.util.Arrays.fill(out, '0'.toByte)
      return UTF8String.fromBytes(out)
    }
    var d0 = 0
    while (d0 < dim) {
      if (vec.isNullAt(d0)) {
        java.util.Arrays.fill(out, '0'.toByte)
        return UTF8String.fromBytes(out)
      }
      d0 += 1
    }
    var p = 0
    while (p < planes) {
      var dot = 0.0
      val base = p * dim
      var d = 0
      while (d < dim) { dot += vec.getDouble(d) * signs(base + d); d += 1 }
      out(p) = if (dot > 0) '1' else '0'
      p += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Column API; `signs` as produced by `Dedup.hyperplaneSigns`. */
  def signatureCol(vec: Column, signs: Seq[Seq[Double]]): Column = {
    val dim = signs.head.length
    GraftBridge.column(HyperplaneSigExpr(GraftBridge.expression(vec),
      signs.flatten.toArray, signs.length, dim))
  }
}

/** array<double> → bucket string of `planes` bits ('0'/'1'). */
case class HyperplaneSigExpr(child: Expression, signs: Array[Double],
                             planes: Int, dim: Int) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HyperplaneExprs.signature(input.asInstanceOf[ArrayData], signs, planes, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneExprs.signature($c, $signsRef, $planes, $dim)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_signature"
}
