package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Aggregation patterns a 100-TB pipeline leans on that plain
  * `groupBy.agg` doesn't give you by itself: incremental maintenance
  * of a per-key aggregate state table (never re-scan the base), and
  * two-phase salted aggregation for keys too hot for one reducer.
  *
  * Both produce the SAME answers as the single-shot aggregate they
  * replace — the oracle for each is the plain `GROUP BY` over all
  * rows — only the physical cost changes.
  *
  * (Reference analog: Gotenberg accumulates per-host request metrics
  * incrementally as requests arrive — `pkg/gotenberg/metrics.go` hands
  * counters to collectors that merge deltas, never replaying history.)
  */
object AggOps {

  /** The mergeable state carried per key: (cnt, sum_v, min_v, max_v).
    * Deliberately only re-mergeable aggregates — count/sum/min/max
    * compose under union, and avg derives as sum/cnt at read time.
    * Non-mergeable forms (exact median, distinct count) need a sketch
    * (see `Curation.groupQuantiles` / the MinHash layer) or a re-scan.
    */
  private val stateCols = Seq("cnt", "sum_v", "min_v", "max_v")

  /** Build the aggregate state table from scratch: one shuffle on
    * `keyCols` with map-side partial aggregation (Spark's
    * HashAggregate does the partial/final split for free).
    */
  def buildAggState(df: DataFrame, keyCols: Seq[String], v: String): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sum(col(v)).as("sum_v"),
      min(col(v)).as("min_v"),
      max(col(v)).as("max_v"))

  /** Merge per-key state partials: count/sum re-add, min/max
    * re-compare. The one place the state-column contract's merge side
    * lives — [[mergeAggState]] and [[saltedAgg]] both route here.
    */
  private def mergeStates(partials: DataFrame, keyCols: Seq[String]): DataFrame =
    partials.groupBy(keyCols.map(col): _*).agg(
      sum(col("cnt")).as("cnt"),
      sum(col("sum_v")).as("sum_v"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"))

  /** Incremental maintenance: fold a raw delta batch into an existing
    * state table WITHOUT touching base rows. The delta is aggregated
    * to its own per-key partials (cost ∝ |delta|, map-side combined),
    * then partials and state union and re-merge (cost ∝ distinct keys,
    * not base rows). At 100 TB this is the materialized-view move: a
    * daily 0.1% delta costs 0.1% of a recompute plus one key-sized
    * merge. If `state` is stored bucketed by the key (SnapshotStore
    * hidden partitioning), the merge shuffle moves only delta partials.
    *
    * Equivalent to `buildAggState(base ∪ delta)` — count/sum re-add,
    * min/max re-compare; floating-point sums associate differently
    * than a single-shot scan, so readers round (q70 rounds to 4).
    */
  def mergeAggState(state: DataFrame, deltaRaw: DataFrame,
                    keyCols: Seq[String], v: String): DataFrame = {
    val deltaState = buildAggState(deltaRaw, keyCols, v)
    mergeStates(
      state.select((keyCols ++ stateCols).map(col): _*)
        .unionByName(deltaState.select((keyCols ++ stateCols).map(col): _*)),
      keyCols)
  }

  /** Two-phase salted aggregation for skewed keys. Phase 1 groups by
    * (key, salt) where the salt spreads each key's rows over
    * `numSalts` reducers — a key holding 30% of a 100-TB table stops
    * serializing one reducer and one spill file. Phase 2 merges the
    * ≤ numSalts partials per key — input is numSalts × |keys| rows,
    * negligible. The salt is `pmod(hash(saltFrom), numSalts)`:
    * deterministic per row, uniform, and never part of the answer.
    *
    * Spark's own partial aggregation already splits hot keys across
    * MAP tasks; salting additionally splits them across REDUCERS,
    * which matters exactly when per-key partials are too many for one
    * final task (huge cardinality × hot key) — the same reason AQE
    * skew-join splitting exists for joins.
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], v: String,
                saltFrom: String, numSalts: Int): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(col(saltFrom)), lit(numSalts)))
    mergeStates(buildAggState(salted, keyCols :+ "_salt", v), keyCols)
  }
}
