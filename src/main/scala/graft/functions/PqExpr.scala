package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Product-quantization ROUND-TRIP of an `array<double>` vector —
  * models the storage format of a PQ-compressed IVF list (Jégou,
  * Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011): the vector splits into `m` contiguous subspaces of
  * `subDim` dims each; each subspace stores only the INDEX of its
  * nearest codeword in a per-subspace codebook of `numCodes` entries.
  * Storage is `m · log2(numCodes)` bits per vector — at production
  * shape (m=8 bytes over 64 dims of float64) a 64× payload reduction,
  * the tier past SQ8's 8× ([[Sq8Exprs]]); the probed-list scan sees the
  * reconstruction (concatenated chosen codewords) this expression
  * returns.
  *
  * Codeword choice per subspace: argmin over the codebook of
  * `round(sqrt(Σ_d (x_d − c_d)²), 6)` with ties to the SMALLEST
  * codeword index — the squared diffs accumulate left-to-right, sqrt
  * and HALF_UP round-6 exactly as [[NearestCentroidExprs.round6]], so
  * the DuckDB oracle twin (`row_number() over (order by
  * round(list_distance(sub, cw), 6), j)`) is bit-identical (verified
  * exhaustively over the sf0.01 table before this landed). The
  * codebook is data-derived but training-free: the md5-ordered sample
  * the IVF centroid pick already uses, sliced per subspace — no k-means
  * iterations, so both engines construct the identical codebook from
  * the table alone.
  *
  * A null element in the first `m·subDim` positions yields null (the
  * [[Sq8Exprs]] / [[CosineSimilarityExpr]] convention); a vector
  * shorter than `m·subDim` also yields null (no partial subspaces).
  * Trailing dims past `m·subDim` are dropped from the reconstruction —
  * callers pass a codebook covering the full dim.
  */
object PqExprs {

  /** `codes` is flattened (subspace s, codeword j) → doubles at
    * `[(s·numCodes + j)·subDim, …+subDim)`. Returns the reconstructed
    * vector (length m·subDim) or null on null/short input.
    */
  def roundTrip(vec: ArrayData, codes: Array[Double], m: Int, subDim: Int,
                numCodes: Int): GenericArrayData = {
    val dim = m * subDim
    if (vec.numElements() < dim) return null
    var i = 0
    while (i < dim) { if (vec.isNullAt(i)) return null; i += 1 }
    val out = new Array[Any](dim)
    var s = 0
    while (s < m) {
      val off = s * subDim
      var bestDist = Double.PositiveInfinity
      var bestJ = -1
      var j = 0
      while (j < numCodes) {
        val base = (s * numCodes + j) * subDim
        var acc = 0.0
        var d = 0
        while (d < subDim) {
          val diff = vec.getDouble(off + d) - codes(base + d)
          acc += diff * diff
          d += 1
        }
        val dist = NearestCentroidExprs.round6(math.sqrt(acc))
        if (dist < bestDist) { bestDist = dist; bestJ = j }
        j += 1
      }
      val base = (s * numCodes + bestJ) * subDim
      var d = 0
      while (d < subDim) { out(off + d) = codes(base + d); d += 1 }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Column API; `codebook(s)(j)` is codeword j of subspace s, each of
    * length subDim.
    */
  def roundTripCol(vec: Column, codebook: Seq[Seq[Seq[Double]]]): Column = {
    require(codebook.nonEmpty && codebook.head.nonEmpty, "PQ codebook must be non-empty")
    val m = codebook.length
    val numCodes = codebook.head.length
    val subDim = codebook.head.head.length
    require(codebook.forall(s => s.length == numCodes && s.forall(_.length == subDim)),
      s"ragged PQ codebook (want $m x $numCodes x $subDim)")
    val flat = new Array[Double](m * numCodes * subDim)
    var i = 0
    for (s <- codebook; j <- s; d <- j) { flat(i) = d; i += 1 }
    GraftBridge.column(PqRoundTripExpr(
      GraftBridge.expression(vec.cast("array<double>")), flat, m, subDim, numCodes))
  }
}

/** array<double> → array<double> reconstructed from PQ codes. */
case class PqRoundTripExpr(child: Expression, codes: Array[Double], m: Int,
                           subDim: Int, numCodes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true // null input OR null element OR short vector
  override def nullSafeEval(input: Any): Any =
    PqExprs.roundTrip(input.asInstanceOf[ArrayData], codes, m, subDim, numCodes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val codesRef = ctx.addReferenceObj("codes", codes, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  graft.functions.PqExprs.roundTrip($c, $codesRef, $m, $subDim, $numCodes);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_round_trip"
}
