package graft.datatools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ZOrderExpr

/** Data-layout operators — the write-side clustering that makes the
  * read-side metadata pruning (snapshot-store min/max stats, Iceberg
  * manifest filtering) effective at 100 TB. Correctness of a layout is
  * its bucket statistics: every bucket's per-dimension (min, max) is
  * what a scan planner prunes against, so the operators here RETURN
  * those stats and the specs assert the clustering property on them.
  */
object Layout {

  /** Z-ORDER BUCKETING over two integer dimensions: normalize each
    * dimension into [0, 2^bits) by its global (min, max) — integer
    * arithmetic, `(x - mn) * (2^bits - 1) div (mx - mn)` — Morton-
    * interleave the two normalized keys ([[graft.functions.ZOrderExpr]],
    * codegen), and assign each row to one of `2^bucketBits` buckets by
    * the HIGH bits of the z-value (a fixed-width z-range per bucket:
    * deterministic, no sampling, unlike `repartitionByRange`'s
    * sampled boundaries — reproducibility is what the oracle checks).
    * Returns per-bucket row counts and per-dimension (min, max): the
    * file-skipping stats a predicate on EITHER dimension would prune
    * against.
    *
    * Plan shape: one tiny global agg for the dimension bounds (driver
    * scalar, the q47 convention), then ONE projection + ONE partial-agg
    * shuffle keyed on the bucket id — 2^bucketBits groups, so the
    * exchange carries bucket stats, not rows. At 100 TB the same two
    * passes hold; the write path would add `repartition(col("bucket"))
    * .sortWithinPartitions("z")` before the sink, which shuffles data
    * exactly once.
    */
  def zorderBuckets(df: DataFrame, dimA: String, dimB: String,
                    bits: Int = 16, bucketBits: Int = 6): DataFrame = {
    require(bucketBits >= 1 && 2 * bits >= bucketBits,
      s"need 1 <= bucketBits <= 2*bits, got bits=$bits bucketBits=$bucketBits")
    val bounds = df.agg(
      min(col(dimA).cast("bigint")), max(col(dimA).cast("bigint")),
      min(col(dimB).cast("bigint")), max(col(dimB).cast("bigint"))).first()
    val spark = df.sparkSession
    if (bounds.isNullAt(0) || bounds.isNullAt(2))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "bucket BIGINT, n_rows BIGINT, min_a BIGINT, max_a BIGINT, min_b BIGINT, max_b BIGINT"))
    val (mnA, mxA, mnB, mxB) = (bounds.getLong(0), bounds.getLong(1),
      bounds.getLong(2), bounds.getLong(3))
    val top = (1L << bits) - 1L
    // exact integer scaling (SQL DIV, not fp `/`): the oracle's `//`
    // and this must truncate identically at every input
    def norm(c: String, mn: Long, mx: Long) =
      if (mx == mn) lit(0L) else expr(s"(($c - ${mn}L) * ${top}L) DIV ${mx - mn}L")
    df.select(col(dimA).cast("bigint").as("a"), col(dimB).cast("bigint").as("b"),
        ZOrderExpr.zorder(norm(dimA, mnA, mxA), norm(dimB, mnB, mxB), bits).as("z"))
      .withColumn("bucket", shiftright(col("z"), 2 * bits - bucketBits))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("a").as("min_a"), max("a").as("max_a"),
        min("b").as("min_b"), max("b").as("max_b"))
  }
}
