package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.datatools.Layout
import graft.functions.ZOrderExpr

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave: the plain bit loop the mask-doubling
    * spread must agree with.
    */
  private def interleaveRef(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zorder interleave: mask-doubling spread == bit loop (scala + codegen)") {
    val gen = for {
      a <- Gen.chooseNum(0L, (1L << 32) - 1)
      b <- Gen.chooseNum(0L, (1L << 32) - 1)
      bits <- Gen.oneOf(1, 7, 16, 21, 32)
    } yield (a, b, bits)
    val cases = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    sample(gen, 200, 87L) { case (a, b, bits) =>
      assert(ZOrderExpr.interleave(a, b, bits) === interleaveRef(a, b, bits))
      cases += ((a, b, bits))
    }
    // the codegen path (DataFrame projection) agrees with the eval path
    cases.groupBy(_._3).foreach { case (bits, cs) =>
      val got = cs.toSeq.map { case (a, b, _) => (a, b) }.toDF("a", "b")
        .select(ZOrderExpr.zorder(col("a"), col("b"), bits).as("z"))
        .as[Long].collect().toSeq
      assert(got === cs.toSeq.map { case (a, b, _) => interleaveRef(a, b, bits) })
    }
  }

  test("zorderBuckets matches brute force (normalize, interleave, high-bits bucket)") {
    val gen = for {
      n <- Gen.choose(0, 300)
      rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(-50L, 5000L), Gen.chooseNum(0L, 99L)))
    } yield rows
    sample(gen, 10, 88L) { rows =>
      val got = Layout.zorderBuckets(rows.toDF("ka", "kb"), "ka", "kb",
          bits = 16, bucketBits = 6)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      val expect =
        if (rows.isEmpty) Set.empty[(Long, Long, Long, Long, Long, Long)]
        else {
          val (as, bs) = (rows.map(_._1), rows.map(_._2))
          val (mnA, mxA, mnB, mxB) = (as.min, as.max, bs.min, bs.max)
          def norm(x: Long, mn: Long, mx: Long): Long =
            if (mx == mn) 0L else (x - mn) * 65535L / (mx - mn)
          rows.groupBy { case (a, b) =>
            interleaveRef(norm(a, mnA, mxA), norm(b, mnB, mxB), 16) >> 26
          }.map { case (bk, rs) =>
            (bk, rs.size.toLong, rs.map(_._1).min, rs.map(_._1).max,
              rs.map(_._2).min, rs.map(_._2).max)
          }.toSet
        }
      assert(got === expect)
    }
  }

  test("zorderBuckets: both dimensions cluster (bucket span ~ 1/8 of range each)") {
    // 64 buckets = 3 high bits per dimension: every bucket's span in
    // EACH dimension is one-eighth of that dimension's range (+ the
    // integer-normalization rounding slack) — the property that makes
    // min/max file stats prunable on either predicate column.
    val stats = Layout.zorderBuckets(
        spark.read.parquet(s"$sfDir/lineitem.parquet"), "l_partkey", "l_suppkey",
        bits = 16, bucketBits = 6)
      .agg(max(col("max_a") - col("min_a")), max(col("max_b") - col("min_b")),
        max("max_a"), min("min_a"), max("max_b"), min("min_b"), count(lit(1)))
      .first()
    val (spanA, spanB) = (stats.getLong(0), stats.getLong(1))
    val rangeA = stats.getLong(2) - stats.getLong(3)
    val rangeB = stats.getLong(4) - stats.getLong(5)
    assert(stats.getLong(6) > 1, "property needs multiple buckets")
    assert(spanA <= rangeA / 8 + 2, s"dim a bucket span $spanA vs range $rangeA")
    assert(spanB <= rangeB / 8 + 2, s"dim b bucket span $spanB vs range $rangeB")
  }

  test("zorderBuckets: degenerate single-value dimension goes to norm 0") {
    val got = Layout.zorderBuckets(
        Seq((1L, 7L), (100L, 7L), (50L, 7L)).toDF("ka", "kb"), "ka", "kb",
        bits = 16, bucketBits = 6)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // kb constant → nb = 0 for all rows; buckets split on ka only
    assert(got.forall { case (_, _, _, _, mnB, mxB) => mnB == 7L && mxB == 7L })
    assert(got.map(_._2).sum === 3L)
  }
}
