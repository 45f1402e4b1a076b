package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Fused IVF centroid assignment: `array<double>` vector → the id of
  * its nearest centroid, computed in ONE projection over a broadcast
  * centroid matrix (a reference object, like [[HyperplaneSigExpr]]'s
  * sign matrix).
  *
  * This is the third form the assignment has taken, each strictly
  * cheaper at scale:
  *   1. corpus × nList explode-join + `row_number()` window — a full
  *      shuffle AND sort of 16× the corpus;
  *   2. the same join + partial-aggregating `max_by` — exchange shrinks
  *      to one row per corpus id, but the array-typed aggregation
  *      buffer forces SortAggregate (HashAggregate needs fixed-size
  *      mutable buffers), so the map side still sorts 16× the corpus;
  *   3. this expression — narrow, no join, no exchange, no sort; the
  *      16n intermediate rows never exist.
  *
  * Semantics are pinned to the original plan (and therefore the q35
  * oracle): per centroid, the similarity is [[CosineSimilarityExpr]]'s
  * exact arithmetic (left-to-right accumulation over the common prefix,
  * NaN → -1.0) rounded like Spark's `round(_, 6)` (HALF_UP over
  * `BigDecimal.valueOf`), and the argmax breaks exact ties on the
  * SMALLEST centroid id — `row_number() over (csim DESC, cid ASC)`
  * rank 1. A null vector element yields null (the row drops out of the
  * probed lists; DuckDB raises on null elements so no oracle row can
  * observe the difference).
  */
object NearestCentroidExprs {

  /** Spark `round(x, 6)` for doubles: HALF_UP over the
    * `Double.toString` decimal representation (`BigDecimal.valueOf`) —
    * bit-identical to Catalyst's Round, which q35's oracle parity
    * depends on.
    */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** `cents` is centroid-major flattened (centroid c occupies
    * `[c*dim, (c+1)*dim)`); `cids(c)` is its id. Returns the chosen id
    * or null (boxed) when a vector element in the common prefix is null.
    */
  def nearest(vec: ArrayData, cents: Array[Double], cids: Array[Long], dim: Int): java.lang.Long = {
    val n = math.min(vec.numElements(), dim)
    var i = 0
    while (i < n) { if (vec.isNullAt(i)) return null; i += 1 }
    var bestSim = Double.NegativeInfinity
    var bestCid = Long.MaxValue
    var c = 0
    while (c < cids.length) {
      val base = c * dim
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var d = 0
      while (d < n) {
        val xi = vec.getDouble(d); val yi = cents(base + d)
        dot += xi * yi; nx += xi * xi; ny += yi * yi
        d += 1
      }
      var sim = dot / (math.sqrt(nx) * math.sqrt(ny))
      if (java.lang.Double.isNaN(sim)) sim = -1.0
      sim = round6(sim)
      if (sim > bestSim || (sim == bestSim && cids(c) < bestCid)) {
        bestSim = sim; bestCid = cids(c)
      }
      c += 1
    }
    bestCid
  }

  /** Column API; centroids as (id, vector) pairs, all `vector.length ==
    * dim`.
    */
  def nearestCol(vec: Column, centroids: Seq[(Long, Seq[Double])], dim: Int): Column = {
    require(centroids.nonEmpty, "nearestCol needs at least one centroid")
    require(centroids.forall(_._2.length == dim), s"all centroids must have dim $dim")
    GraftBridge.column(NearestCentroidExpr(GraftBridge.expression(vec),
      centroids.flatMap(_._2).toArray, centroids.map(_._1).toArray, dim))
  }
}

/** array<double> → nearest centroid id (codegen'd fused argmax). */
case class NearestCentroidExpr(child: Expression, cents: Array[Double],
                               cids: Array[Long], dim: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null input OR null element
  override def nullSafeEval(input: Any): Any =
    NearestCentroidExprs.nearest(input.asInstanceOf[ArrayData], cents, cids, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[]")
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Long $r = graft.functions.NearestCentroidExprs.nearest($c, $centsRef, $cidsRef, $dim);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroid"
}
