package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed MERGE/UPSERT — the table-maintenance verb behind Iceberg's
  * `MERGE INTO` and every CDC ingest: fold a delta batch into a base
  * table with last-writer-wins semantics. The graft's SnapshotStore
  * appends immutable deltas (`sources/SnapshotStore.scala`); this is
  * the complementary read-side/compaction-side collapse that turns
  * (base ∪ deltas) into current-state rows.
  *
  * Reference analog: gotenberg's webhook store overwrites per-key
  * output artifacts on re-conversion (api/pkg/modules/webhook — latest
  * result wins per filename); at table scale that per-key overwrite IS
  * an upsert.
  */
object MergeOps {

  /** Upsert `delta` into `base` keyed by `keyCols`: keys present in
    * the delta take the delta's row (the one with the greatest
    * `(versionCol, remaining columns)` — lexicographic struct max, so
    * duplicate versions still resolve deterministically and partial
    * aggregation is safe); keys absent from the delta keep their base
    * row; delta-only keys are inserted. Schemas must match. The base
    * is assumed keyed (one row per key, the table contract a MERGE
    * target always has); duplicate base rows for a key NOT in the
    * delta pass through untouched.
    *
    * 100-TB shape: the delta collapses to one row per key with a
    * partial-agg struct max (cost ∝ |delta|), and the base is pruned
    * with a BROADCAST left-anti join on just the delta's keys — the
    * base table is read once and NEVER shuffled, which is the whole
    * point of merge-on-read at scale (shuffling a 100-TB base to apply
    * a MB-scale CDC batch is the anti-pattern). `broadcastDelta =
    * false` drops the hint for deltas too big to broadcast (~10⁸+
    * keys); the anti-join then shuffles both sides but stays
    * O(base + delta).
    */
  def upsert(base: DataFrame, delta: DataFrame, keyCols: Seq[String],
             versionCol: String, broadcastDelta: Boolean = true): DataFrame = {
    require(base.columns.sorted.sameElements(delta.columns.sorted),
      s"upsert schema mismatch: base ${base.columns.mkString(",")} vs delta ${delta.columns.mkString(",")}")
    val payload = base.columns.filterNot(keyCols.contains).toSeq
    require(payload.contains(versionCol), s"versionCol $versionCol must be a non-key column")
    // version leads the struct so lexicographic max = max version,
    // ties resolved by the remaining payload columns
    val ordered = versionCol +: payload.filterNot(_ == versionCol)
    // persisted: consumed twice (anti-join key side + union side) —
    // without it the delta aggregates twice; delta-sized, so cheap by
    // the same small-delta assumption that justifies the broadcast.
    // Released by callers per the Verify/Bench cache contract.
    val latest = delta.groupBy(keyCols.map(col): _*)
      .agg(max(struct(ordered.map(col): _*)).as("_w"))
      .select(keyCols.map(col) ++ ordered.map(c => col(s"_w.$c").as(c)): _*)
      .persist()
    val deltaKeys = latest.select(keyCols.map(col): _*)
    val keep = base.join(
      if (broadcastDelta) broadcast(deltaKeys) else deltaKeys,
      keyCols, "left_anti")
    keep.unionByName(latest.select(base.columns.map(col).toSeq: _*))
  }

  /** SCD-TYPE-2 history build — turn a change stream (key, ts, value)
    * into versioned validity intervals: consecutive rows with the same
    * value collapse, each surviving change opens an interval
    * `[valid_from, valid_to)` closed by the key's next change;
    * `valid_to IS NULL` marks the current row. The standard
    * dimension-history verb of every warehouse load.
    *
    * Determinism: rows order by (ts, `tieCol`) within a key, and the
    * change test is null-safe (`<=>`), so equal-timestamp events and
    * null values resolve identically in any engine.
    *
    * 100-TB shape: one exchange on the key; both windows and the
    * collapse filter share the same (key, ts, tie) ordering, so
    * Catalyst plans a single Exchange + Sort reused by both Window
    * operators — the change stream is shuffled exactly once.
    *
    * @return one row per surviving change:
    *         (keyCols*, valueCol, valid_from, valid_to, is_current).
    */
  def scd2(changes: DataFrame, keyCols: Seq[String], tsCol: String,
           valueCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val changed = changes
      .withColumn("_prev", lag(col(valueCol), 1).over(byKey))
      .withColumn("_first", row_number().over(byKey) === 1)
      .filter(col("_first") || !(col(valueCol) <=> col("_prev")))
      .select(keyCols.map(col) :+ col(valueCol) :+ col(tsCol).as("valid_from")
        :+ col(tieCol).as("_tie"): _*)
    val byFrom = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("valid_from"), col("_tie"))
    changed
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byFrom))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_tie")
  }
}
