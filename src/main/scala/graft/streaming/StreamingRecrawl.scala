package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming freshness tier (SURVEY.md §2.8 custom state): the
  * [[graft.frontier.Recrawl]] batch estimators re-expressed as
  * `mapGroupsWithState` folds, so the crawl's recrawl priorities and
  * per-host AIMD rates update INCREMENTALLY as fetch outcomes stream
  * in, instead of re-aggregating the whole fetch log per scheduling
  * round — at 10¹⁰ URLs the log re-scan is the cost that kills a
  * batch-only freshness loop. State per key is O(1) (a handful of
  * longs + the last fingerprint), the streaming analog of the batch
  * aggregation's accumulator row; keys are URLs (schedule) or hosts
  * (AIMD), the same parallelism units as the batch exchanges.
  *
  * Batch ≡ stream (StreamingRecrawlSpec pins both): after any prefix
  * of the fetch log has been fed, each key's LATEST emitted row equals
  * the batch operator run over exactly that prefix — the same
  * fixed-point integer arithmetic, fold order, and tiebreaks.
  *
  * Ordering contract: the fetch log is an append-in-time-order stream
  * per key (what a fetch pipeline's commit order produces). Rows
  * within a micro-batch are sorted by (ts, tie) before folding;
  * ACROSS micro-batches a row at-or-before the state's last (ts, tie)
  * is treated as an at-least-once replay and ignored (the
  * StreamingDedup convention). True out-of-order history — a row
  * arriving after a LATER row was already folded — is unsupported;
  * replay it through the batch twin, which sorts globally.
  */
object StreamingRecrawl {

  /** One fetch outcome: `tsMicros` = epoch-micros fetch time, `tie` =
    * deterministic within-timestamp tiebreak, `fp` = content
    * fingerprint (schedule) and `fail` = throttle/error flag (AIMD).
    */
  final case class FetchEvent(key: String, tsMicros: Long, tie: Long,
                              fp: String, fail: Boolean)

  final case class ScheduleState(nObs: Long, nChanges: Long,
                                 lastTs: Long, lastTie: Long, lastFp: String)

  /** Emitted schedule row — the batch
    * [[graft.frontier.Recrawl.schedule]] columns.
    */
  final case class ScheduleRow(url_key: String, n_obs: Long, n_changes: Long,
                               change_rate_ppm: Long, age_hours: Long,
                               priority_ppm: Long)

  final case class AimdState(rate: Long, mn: Long, nEvents: Long, nFail: Long,
                             lastTs: Long, lastTie: Long)

  /** Emitted AIMD row — the batch
    * [[graft.frontier.Recrawl.aimdRates]] columns.
    */
  final case class AimdRow(host: String, n_events: Long, n_fail: Long,
                           final_rate: Long, min_rate: Long)

  /** Drop already-folded rows (at-least-once replay / same-batch dup),
    * keep the rest sorted — the fold order the batch lag() window uses.
    */
  private def freshSorted(rows: Iterator[FetchEvent], lastTs: Long,
                          lastTie: Long): Seq[FetchEvent] =
    rows.toSeq
      .filter(e => e.tsMicros > lastTs || (e.tsMicros == lastTs && e.tie > lastTie))
      .sortBy(e => (e.tsMicros, e.tie))

  /** Per-URL Poisson change-rate schedule, streaming: one updated
    * [[ScheduleRow]] per touched URL per micro-batch (Update mode).
    * `asOfMicros` is the evaluation instant for age/priority — fixed
    * per query like the batch twin's `asOf` column (a production loop
    * restarts the query per scheduling round or recomputes
    * age/priority downstream; rate state is the expensive part).
    */
  def scheduleStream(spark: SparkSession, fetches: Dataset[FetchEvent],
                     asOfMicros: Long): Dataset[ScheduleRow] = {
    import spark.implicits._
    fetches.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[FetchEvent], state: GroupState[ScheduleState]) =>
          var st = state.getOption.getOrElse(
            ScheduleState(-1L, 0L, Long.MinValue, Long.MinValue, null))
          freshSorted(rows, st.lastTs, st.lastTie).foreach { e =>
            // nObs starts at -1: the batch counts PAIRS (fetches - 1).
            // Null-fp events mirror the batch twin's null-ignored
            // `fp =!= prev_fp` comparison: a change is counted only
            // when BOTH fingerprints are non-null and differ (r05
            // ADVICE: lastFp="x" -> fp=null must not count)
            val changed = st.lastFp != null && e.fp != null && st.lastFp != e.fp
            st = ScheduleState(st.nObs + 1L,
              st.nChanges + (if (changed) 1L else 0L),
              e.tsMicros, e.tie, e.fp)
          }
          state.update(st)
          val nObs = math.max(st.nObs, 0L)
          val rate = if (nObs > 0) st.nChanges * 1000000L / nObs else 0L
          // truncating division exactly like the batch's `div` (Spark
          // SQL DIV truncates toward zero) — equal on the nonnegative
          // ages the schedule supports AND on the negative-age regime
          // (asOf before the last fetch), where floorDiv diverged (r05
          // ADVICE)
          val ageHours = (asOfMicros - st.lastTs) / 3600000000L
          ScheduleRow(key, nObs, st.nChanges, rate, ageHours,
            math.min(1000000L, rate * ageHours))
      }
  }

  /** Per-host AIMD rate adaptation, streaming: one updated [[AimdRow]]
    * per touched host per micro-batch (Update mode). Same fold as the
    * batch twin: success → min(rate + add, cap); failure →
    * max(rate div 2, floorRate); `mn` tracks the post-step minimum.
    */
  def aimdStream(spark: SparkSession, fetches: Dataset[FetchEvent],
                 start: Long = 1000L, add: Long = 200L, cap: Long = 8000L,
                 floorRate: Long = 125L): Dataset[AimdRow] = {
    import spark.implicits._
    require(start >= floorRate && add > 0 && cap >= start && floorRate >= 1)
    fetches.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[FetchEvent], state: GroupState[AimdState]) =>
          var st = state.getOption.getOrElse(
            AimdState(start, start, 0L, 0L, Long.MinValue, Long.MinValue))
          freshSorted(rows, st.lastTs, st.lastTie).foreach { e =>
            val stepped =
              if (e.fail) math.max(st.rate / 2L, floorRate)
              else math.min(st.rate + add, cap)
            st = AimdState(stepped, math.min(st.mn, stepped),
              st.nEvents + 1L, st.nFail + (if (e.fail) 1L else 0L),
              e.tsMicros, e.tie)
          }
          state.update(st)
          AimdRow(key, st.nEvents, st.nFail, st.rate, st.mn)
      }
  }
}
