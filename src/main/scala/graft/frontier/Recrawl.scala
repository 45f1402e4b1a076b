package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adaptive recrawl scheduling — the frontier's freshness side. A
  * crawler that only DISCOVERS is half a crawler; the other half
  * decides when to fetch a known URL again. The estimator is the
  * classic one (Cho & Garcia-Molina, "Effective page refresh policies
  * for web crawlers", TODS 2003): treat page change as a Poisson
  * process, estimate each URL's change rate from its fetch history
  * (how many consecutive fetch pairs saw a different content
  * fingerprint), and prioritize URLs by expected staleness — rate ×
  * time-since-last-fetch, the linearized small-λΔt form of
  * 1 − e^(−λΔt), capped at 1. All FIXED-POINT integer arithmetic (the
  * q48 PageRank convention: ppm scale, floor division) so any engine
  * replays it bit-exactly.
  *
  * (Reference analog: Gotenberg re-converts a URL on every request —
  * its freshness policy is "always stale", `pkg/modules/chromium`
  * navigates per call. At 10¹⁰ URLs that policy is the crawl budget's
  * death; rate-based scheduling is what replaces it.)
  *
  * Scale shape: ONE exchange — the per-URL history needs lag() over
  * (url ORDER BY ts, tiebreak), a single hashpartitioning on the URL
  * key whose sort the subsequent per-URL aggregation reuses (partial
  * agg over already-grouped data). No self-joins, no second shuffle:
  * the change/observation counters, last-fetch timestamp, and priority
  * all fold in the same aggregation. At 100 TB the fetch history is
  * exactly the crawl's fetch_log table, already partitioned by URL
  * hash, so the exchange is free in practice.
  */
object Recrawl {

  /** Per-URL change-rate estimate + recrawl priority from a fetch
    * history.
    *
    * @param fetches fetch-history rows
    * @param urlCol  URL key column
    * @param tsCol   fetch timestamp column
    * @param tieCol  deterministic within-timestamp tiebreak (an event
    *                id) — makes lag() engine-independent
    * @param fpCol   content-fingerprint column (any string; compared
    *                for equality between consecutive fetches)
    * @param asOf    the "now" timestamp column/literal priorities are
    *                evaluated at
    * @return one row per URL:
    *         (url_key, n_obs, n_changes, change_rate_ppm, age_hours,
    *         priority_ppm) — n_obs = consecutive-pair observations
    *         (fetches − 1), rate_ppm = changes·10⁶ div obs (0 when no
    *         pairs), age_hours = floor((asOf − last fetch)/3600 s),
    *         priority_ppm = min(10⁶, rate_ppm · age_hours).
    */
  def schedule(fetches: DataFrame, urlCol: String, tsCol: String, tieCol: String,
               fpCol: Column, asOf: Column): DataFrame = {
    val w = Window.partitionBy(col("url_key")).orderBy(col("ts"), col("tie"))
    val obs = fetches
      .select(col(urlCol).as("url_key"), col(tsCol).as("ts"), col(tieCol).as("tie"),
        fpCol.as("fp"))
      .withColumn("prev_fp", lag(col("fp"), 1).over(w))
    val agg = obs.groupBy(col("url_key")).agg(
      count(col("prev_fp")).as("n_obs"),
      count(when(col("prev_fp").isNotNull && col("fp") =!= col("prev_fp"), 1))
        .as("n_changes"),
      max(col("ts")).as("last_ts"))
    val rate = when(col("n_obs") > 0,
      expr("n_changes * 1000000 div n_obs")).otherwise(lit(0L))
    agg
      .withColumn("change_rate_ppm", rate)
      // integer div on microseconds (the q22 sessionize convention:
      // unix_micros under a UTC session twin of DuckDB's epoch_us) —
      // ages are nonnegative (asOf ≥ every fetch), so div = floor and
      // no IEEE rounding enters the output
      .withColumn("age_us",
        unix_micros(asOf.cast("timestamp")) -
          unix_micros(col("last_ts").cast("timestamp")))
      .withColumn("age_hours", expr("age_us div 3600000000"))
      .withColumn("priority_ppm",
        least(lit(1000000L), col("change_rate_ppm") * col("age_hours")))
      .select("url_key", "n_obs", "n_changes", "change_rate_ppm",
        "age_hours", "priority_ppm")
  }

  /** AIMD per-host rate adaptation — the congestion-control loop a
    * polite crawler runs against each origin (additive increase on
    * success, multiplicative decrease on throttle/error — TCP's AIMD,
    * Chiu & Jain 1989, applied to fetch concurrency): replay each
    * host's fetch outcomes in time order and fold the rate state.
    * All integer milli-units, so the fold replays bit-exactly:
    *
    *   rate₀ = `start`;  success → min(rate + `add`, `cap`);
    *   failure → max(rate div 2, `floorRate`)
    *
    * Scale shape: ONE exchange (groupBy host); the history is folded
    * INSIDE the row by `sort_array` + `aggregate` — both codegen
    * builtins, no UDF, no window. Per-host history is bounded by the
    * politeness layer itself (a host's fetch count per window is
    * capped by the very quota this loop tunes), so collect_list stays
    * executor-safe by construction; hosts are the parallelism unit.
    *
    * @param failCol boolean column: true = throttle/error outcome
    * @return (host, n_events, n_fail, final_rate, min_rate) by host
    */
  def aimdRates(fetches: DataFrame, hostCol: String, tsCol: String,
                tieCol: String, failCol: Column,
                start: Long = 1000L, add: Long = 200L, cap: Long = 8000L,
                floorRate: Long = 125L): DataFrame = {
    require(start >= floorRate && add > 0 && cap >= start && floorRate >= 1)
    val step = (acc: String, fail: String) =>
      s"CASE WHEN $fail THEN greatest($acc DIV 2, ${floorRate}L) " +
        s"ELSE least($acc + ${add}L, ${cap}L) END"
    fetches
      .groupBy(col(hostCol).as("host"))
      .agg(
        sort_array(collect_list(struct(
          col(tsCol).as("ts"), col(tieCol).as("tie"), failCol.as("fail")))).as("h"))
      .select(col("host"),
        size(col("h")).cast("long").as("n_events"),
        expr("aggregate(h, 0L, (a, x) -> a + IF(x.fail, 1L, 0L))").as("n_fail"),
        expr(
          s"""aggregate(h, named_struct('rate', ${start}L, 'mn', ${start}L),
             |  (a, x) -> named_struct(
             |    'rate', ${step("a.rate", "x.fail")},
             |    'mn', least(a.mn, ${step("a.rate", "x.fail")})))""".stripMargin)
          .as("st"))
      .select(col("host"), col("n_events"), col("n_fail"),
        col("st.rate").as("final_rate"), col("st.mn").as("min_rate"))
      .orderBy("host")
  }
}
