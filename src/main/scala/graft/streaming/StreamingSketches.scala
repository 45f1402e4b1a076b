package graft.streaming

import graft.datatools.Sketches
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV distinct-count: the per-group sketch lives in
  * `flatMapGroupsWithState` state and every micro-batch emits the
  * group's refreshed estimate — the streaming twin of
  * [[graft.datatools.Sketches.kmvDistinct]], the way a live crawl
  * dashboard tracks distinct-URLs-per-host without ever holding the
  * distinct set.
  *
  * The state is the sketch itself (≤ k longs per group — bounded
  * regardless of stream length), and because KMV insertion is
  * order-independent, the estimate after any prefix of the stream
  * equals the batch [[Sketches.kmvDistinct]] over that prefix
  * (StreamingSketchesSpec pins stream-final == batch). At-least-once
  * replays are absorbed for free: a duplicate hash is a no-op insert.
  */
object StreamingSketches {

  final case class GroupEstimate(g: String, n_kept: Long, kth_hash: Long,
                                 est_distinct: Long)

  /** `rows` is a STREAMING Dataset of (group, value). Emits one
    * (group, n_kept, kth_hash, est_distinct) row per group per
    * micro-batch that touched it (OutputMode.Append downstream
    * keeps the freshest per group).
    */
  def kmvDistinctStream(spark: SparkSession, rows: Dataset[(String, String)],
                        k: Int): Dataset[GroupEstimate] = {
    import spark.implicits._
    require(k >= 2, "k must be >= 2")
    val hashed = rows.toDF("g", "v")
      .filter(col("v").isNotNull)
      .select(col("g"), Sketches.hash48(col("v")).as("h"))
      .as[(String, Long)]
    hashed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g: String, batch: Iterator[(String, Long)], state: GroupState[Seq[Long]]) =>
          // replay the batch into the sketch with the SAME bounded
          // insert the batch aggregator uses (sorted distinct min-k)
          var hs = state.getOption.getOrElse(Vector.empty).toVector
          batch.foreach { case (_, h) =>
            val n = hs.size
            if (!(n == k && h >= hs(n - 1))) {
              var lo = 0; var hi = n; var dup = false
              while (lo < hi && !dup) {
                val mid = (lo + hi) >>> 1
                if (hs(mid) < h) lo = mid + 1
                else if (hs(mid) > h) hi = mid
                else dup = true
              }
              if (!dup) hs = ((hs.take(lo) :+ h) ++ hs.drop(lo)).take(k)
            }
          }
          state.update(hs)
          val n = hs.size
          val kth = if (n == 0) 0L else hs.last
          val est = if (n < k) n.toLong else ((k - 1).toLong << 48) / kth
          Iterator.single(GroupEstimate(g, n.toLong, kth, est))
      }
  }

  final case class GroupHllEstimate(g: String, n_zero_regs: Long,
                                    reg_sum: Long, est_distinct: Long)

  /** Streaming HLL distinct — the CONSTANT-size streaming sketch (64
    * bytes of state per group, forever) next to [[kmvDistinctStream]]'s
    * k longs: the per-group registers live in `flatMapGroupsWithState`
    * state; each micro-batch folds its hashes in (register max — order-
    * independent and replay-idempotent, so at-least-once delivery and
    * arbitrary batch boundaries cannot change the estimate) and emits
    * the refreshed estimate. Stream-final == batch
    * [[Sketches.hllDistinct]] over the same rows
    * (StreamingSketchesSpec pins it).
    */
  def hllDistinctStream(spark: SparkSession,
                        rows: Dataset[(String, String)]): Dataset[GroupHllEstimate] = {
    import spark.implicits._
    val hashed = rows.toDF("g", "v")
      .filter(col("v").isNotNull)
      .select(col("g"), Sketches.hash48(col("v")).as("h"))
      .as[(String, Long)]
    hashed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g: String, batch: Iterator[(String, Long)], state: GroupState[Array[Byte]]) =>
          val regs = state.getOption.getOrElse(new Array[Byte](Sketches.HllM))
          batch.foreach { case (_, h) =>
            val bucket = (h & (Sketches.HllM - 1)).toInt
            val w = h >>> 6
            val rank =
              if (w == 0L) 43.toByte
              else (43 - (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
            if (rank > regs(bucket)) regs(bucket) = rank
          }
          state.update(regs)
          var regSum = 0L; var nZero = 0L; var i = 0
          while (i < Sketches.HllM) {
            val r = regs(i)
            if (r == 0) nZero += 1
            regSum += (1L << 30) >> r
            i += 1
          }
          val raw = Sketches.HllNumerator / regSum / 1000000L
          val est =
            if (raw <= 5L * Sketches.HllM / 2 && nZero > 0)
              Sketches.HllLcTable(nZero.toInt - 1)
            else raw
          Iterator.single(GroupHllEstimate(g, nZero, regSum, est))
      }
  }
}
