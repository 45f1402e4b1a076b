package graft.datatools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence FUNNEL analysis — per user, the earliest strictly-
  * ordered completion of a stage chain (view → click → purchase): the
  * conversion question every event pipeline answers, and the crawl
  * analog of "fetched → converted → webhook-delivered" per URL through
  * the reference's middleware chain (api/pkg/api routes → webhook).
  *
  * Semantics (the standard greedy funnel): t₀ = the user's earliest
  * stage-0 event; tᵢ = the earliest stage-i event STRICTLY after
  * tᵢ₋₁; a user's depth = number of stages reached. Greedy-earliest
  * is deterministic and (for strict ordering) maximizes reachable
  * depth: any valid chain's stage-i time is ≥ the greedy tᵢ, so a
  * chain extends iff the greedy one does.
  *
  * 100-TB shape: one pruned scan per stage (the stage predicate
  * pushes to the store — with event-type partitioning each scan reads
  * only its stage) aggregated to per-user minima, chained by k−1
  * equi-joins on the user key; every frame past the first agg is
  * user-cardinality, not event-cardinality. No windows, no per-user
  * event sort, no event-stream shuffle beyond each stage's own
  * partial-agg'd min.
  *
  * @return (userCol, t0..t{k−1} — tᵢ null once the chain stops —
  *         depth ∈ [1, k]); users who never hit stage 0 are absent.
  */
object Funnel {
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // each stage frame is persisted: it has two consumers (the next
    // stage's join and the running result), and without the persist
    // stage i's PRUNED SCAN re-runs once per later stage. The frames
    // are user-cardinality (tiny next to the event stream); released
    // by callers per the Verify/Bench cache contract.
    var cur = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
      .persist()
    stages.indices.drop(1).foreach { i =>
      val step = events.filter(col(typeCol) === stages(i))
        .select(col(userCol), col(tsCol).as("_ts"))
        .join(cur.select(col(userCol), col(s"t${i - 1}")), Seq(userCol))
        .filter(col("_ts") > col(s"t${i - 1}"))
        .groupBy(col(userCol)).agg(min(col("_ts")).as(s"t$i"))
      cur = cur.join(step, Seq(userCol), "left").persist()
    }
    val depth = stages.indices.drop(1).foldLeft(lit(1L)) { (acc, i) =>
      acc + when(col(s"t$i").isNotNull, lit(1L)).otherwise(lit(0L))
    }
    cur.withColumn("depth", depth)
  }
}
