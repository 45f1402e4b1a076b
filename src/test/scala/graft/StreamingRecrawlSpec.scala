package graft

import graft.frontier.Recrawl
import graft.streaming.StreamingRecrawl
import graft.streaming.StreamingRecrawl.FetchEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming freshness tier vs the batch oracles: after all micro-
  * batches, each key's LATEST emitted row equals the batch operator
  * ([[Recrawl.schedule]] / [[Recrawl.aimdRates]]) over every event fed
  * — same integer arithmetic, same fold order, same tiebreaks.
  */
class StreamingRecrawlSpec extends SparkSpec {

  private val T0 = 1700000000000000L // epoch micros
  private val Hour = 3600000000L

  /** 4 URLs with distinct histories: a flips fingerprint every fetch
    * (and throttles), b never changes (all successes — AIMD climbs to
    * the cap), c changes once mid-history, d is a single fetch. Two
    * events share a timestamp so the tie column decides the fold order.
    */
  private val events: Seq[FetchEvent] = Seq(
    FetchEvent("a", T0 + 0 * Hour, 1L, "x", fail = true),
    FetchEvent("b", T0 + 0 * Hour, 2L, "s", fail = false),
    FetchEvent("a", T0 + 1 * Hour, 1L, "y", fail = true),
    FetchEvent("c", T0 + 1 * Hour, 2L, "c1", fail = false),
    FetchEvent("a", T0 + 2 * Hour, 1L, "x", fail = true),
    FetchEvent("b", T0 + 2 * Hour, 2L, "s", fail = false),
    // same (ts): tie 1 before tie 2 — fp changes c1→c2 then c2→c2
    FetchEvent("c", T0 + 3 * Hour, 1L, "c2", fail = true),
    FetchEvent("c", T0 + 3 * Hour, 2L, "c2", fail = false),
    FetchEvent("a", T0 + 4 * Hour, 1L, "y", fail = true),
    FetchEvent("b", T0 + 4 * Hour, 2L, "s", fail = false),
    FetchEvent("d", T0 + 5 * Hour, 1L, "solo", fail = false),
    FetchEvent("b", T0 + 6 * Hour, 2L, "s", fail = false),
    FetchEvent("b", T0 + 7 * Hour, 2L, "s", fail = false))
  private val asOf = T0 + 9 * Hour

  // three in-order micro-batches (the append-log contract)
  private val batches = Seq(
    events.filter(_.tsMicros <= T0 + 2 * Hour),
    events.filter(e => e.tsMicros > T0 + 2 * Hour && e.tsMicros <= T0 + 4 * Hour),
    events.filter(_.tsMicros > T0 + 4 * Hour))

  private def batchDf = {
    import spark.implicits._
    events.toDF("key", "ts_micros", "tie", "fp", "fail")
      .withColumn("ts", timestamp_micros(col("ts_micros")))
  }

  /** Latest row per key from an Update-mode memory sink: the counter
    * column is nondecreasing per key, so max(counter) is the last
    * emitted state.
    */
  private def latest(table: String, counterCol: String): Map[String, Seq[Any]] =
    spark.table(table).collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) =>
        k -> rs.maxBy(_.getAs[Long](counterCol)).toSeq
      }

  test("stream-final schedule == batch Recrawl.schedule over all fed events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FetchEvent]
    val out = StreamingRecrawl.scheduleStream(spark, input.toDS(), asOfMicros = asOf)
    val query = out.writeStream.format("memory").queryName("streamsched")
      .outputMode(OutputMode.Update).start()
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      val streamed = latest("streamsched", "n_obs")
        .map { case (k, r) => (k, r(1), r(2), r(3), r(4), r(5)) }.toSet
      val batch = Recrawl.schedule(batchDf, "key", "ts", "tie",
          fpCol = col("fp"), asOf = timestamp_micros(lit(asOf)))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      assert(batch.size === 4, "fixture must cover 4 urls")
      assert(streamed === batch)
      // the fixture exercises the estimator, not just the plumbing
      val m = batch.map(t => t._1 -> t).toMap
      assert(m("a")._4 === 1000000L, "a flips every fetch: rate 10^6")
      assert(m("b")._4 === 0L, "b never changes: rate 0")
      assert(m("d")._2 === 0L, "single fetch: zero pair observations")
      assert(m("a")._6 === 1000000L, "priority capped at 10^6")
    } finally query.stop()
  }

  test("stream-final AIMD == batch Recrawl.aimdRates; floor and cap both reached") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FetchEvent]
    // tight cap/floor so the fixture provably hits both rails
    val (start, add, cap, floorR) = (1000L, 500L, 2000L, 250L)
    val out = StreamingRecrawl.aimdStream(spark, input.toDS(), start, add, cap, floorR)
    val query = out.writeStream.format("memory").queryName("streamaimd")
      .outputMode(OutputMode.Update).start()
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      val streamed = latest("streamaimd", "n_events")
        .map { case (k, r) => (k, r(1), r(2), r(3), r(4)) }.toSet
      val batch = Recrawl.aimdRates(batchDf, "key", "ts", "tie",
          failCol = col("fail"), start, add, cap, floorR)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      assert(streamed === batch)
      val m = batch.map(t => t._1 -> t).toMap
      assert(m("a")._5 === floorR, "a's throttle run must reach the floor")
      assert(m("b")._4 === cap, "b's success run must reach the cap")
    } finally query.stop()
  }

  test("at-least-once replay and stale rows are ignored; state carries across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FetchEvent]
    val out = StreamingRecrawl.scheduleStream(spark, input.toDS(), asOfMicros = asOf)
    val query = out.writeStream.format("memory").queryName("streamsched2")
      .outputMode(OutputMode.Update).start()
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      val before = latest("streamsched2", "n_obs")
      input.addData(batches(1): _*) // replay a whole earlier batch
      query.processAllAvailable()
      val after = latest("streamsched2", "n_obs")
      assert(after === before, "replayed rows must fold nothing new")
    } finally query.stop()
  }
}
