package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.UrlEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Structured Streaming semantics: stateful per-host politeness,
  * watermarked window metrics, session windows, webhook-style sink.
  */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("datatools projections run unchanged over a document stream (PII scrub)") {
    // scrubPii is a pure per-row projection, so the SAME operator that
    // runs over the batch corpus runs over readStream with no
    // watermark and Append mode — the streaming-ingest shape of the
    // redaction pass
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = graft.datatools.TextAnalysis.scrubPii(input.toDS().toDF("doc_id", "text"))
    val query = out.writeStream.format("memory").queryName("scrub_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(1L -> "mail a@b.io from 10.0.0.1", 2L -> "clean")
      query.processAllAvailable()
      input.addData(3L -> "card 4111222233334444")
      query.processAllAvailable()
      val rows = spark.table("scrub_stream").as[(Long, Long, Long, Long, String)]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4), r._5)).toMap
      assert(rows(1L) === (((1L, 1L, 0L), "mail <EMAIL> from <IP>")))
      assert(rows(2L) === (((0L, 0L, 0L), "clean")))
      assert(rows(3L) === (((0L, 0L, 1L), "card <CARD>")))
    } finally query.stop()
  }

  test("stateful politeness stream admits at most budget per host per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UrlEvent]
    val out = StreamingOps.politenessStream(spark, input.toDS(), budget = 2,
      windowMs = 1000L * 3600 * 24) // one window for the whole test
    val query = out.writeStream.format("memory").queryName("polite")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        UrlEvent("https://a.test/1", 1.0, 1, ts(0)),
        UrlEvent("https://a.test/2", 2.0, 2, ts(0)),
        UrlEvent("https://a.test/3", 3.0, 3, ts(0)),
        UrlEvent("https://b.test/1", 1.0, 4, ts(0)))
      query.processAllAvailable()
      // second batch: host a budget already exhausted in this window
      input.addData(UrlEvent("https://a.test/4", 9.0, 5, ts(1)))
      query.processAllAvailable()
      val rows = spark.table("polite")
        .select("url_canon", "admitted").collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toMap
      // highest-priority two of host a admitted in batch 1
      assert(rows("https://a.test/3") && rows("https://a.test/2"))
      assert(!rows("https://a.test/1"))
      assert(rows("https://b.test/1"))
      assert(!rows("https://a.test/4"), "budget exhausted carries across batches")
    } finally query.stop()
  }

  test("watermarked window metrics aggregate per event type") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val out = StreamingOps.eventMetricsStream(df)
    val query = out.writeStream.format("memory").queryName("metrics")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(0), "view", 1.0), (ts(0), "view", 2.0), (ts(0), "click", 5.0))
      query.processAllAvailable()
      // advance watermark far enough to close the 10:00 window
      input.addData((ts(10), "view", 1.0))
      query.processAllAvailable()
      val rows = spark.table("metrics")
        .select("event_type", "n_events", "value_total").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rows.contains(("view", 2L, 3.0)))
      assert(rows.contains(("click", 1L, 5.0)))
    } finally query.stop()
  }

  test("session windows split on 30-minute gaps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("ts", "user_id")
    val out = StreamingOps.sessionizeStream(df)
    val query = out.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: events at 10:00 and 10:05 (one session), then 11:00 (new)
      input.addData((ts(0), 1L), (ts(5), 1L),
        (Timestamp.valueOf("2026-01-01 11:00:00"), 1L))
      query.processAllAvailable()
      input.addData((Timestamp.valueOf("2026-01-01 13:00:00"), 2L)) // advance watermark
      query.processAllAvailable()
      val sessions = spark.table("sessions").filter(col("user_id") === 1L).count()
      assert(sessions === 2L)
    } finally query.stop()
  }

  test("webhook sink retries with backoff and survives transient failures") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("webhook-retry").toString
    val ckDir = java.nio.file.Files.createTempDirectory("webhook-retry-ck").toString
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val flaky: (org.apache.spark.sql.DataFrame, Long) => Unit = (batch, batchId) => {
      if (attempts.incrementAndGet() <= 2) sys.error("transient 503")
      batch.withColumn("batch_id", lit(batchId)).write.mode("append").parquet(outDir)
    }
    val input = MemoryStream[(Long, String)]
    val query = StreamingOps.webhookSink(input.toDF().toDF("url_hash", "status"),
      outDir, ckDir, maxRetries = 3, backoffMs = 1L, deliver = flaky).start()
    try {
      input.addData((1L, "ok"), (2L, "ok"))
      query.processAllAvailable()
      assert(attempts.get() === 3, "two transient failures then success")
      assert(spark.read.parquet(outDir).count() === 2)
      assert(!new java.io.File(outDir + "_errors").exists(), "no error events on recovery")
    } finally query.stop()
  }

  test("webhook sink emits an error event after exhausting retries (middleware.go:181-189)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("webhook-dead").toString
    val ckDir = java.nio.file.Files.createTempDirectory("webhook-dead-ck").toString
    val dead: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (_, _) => sys.error("permanent 500")
    val input = MemoryStream[(Long, String)]
    val query = StreamingOps.webhookSink(input.toDF().toDF("url_hash", "status"),
      outDir, ckDir, maxRetries = 2, backoffMs = 1L, deliver = dead).start()
    try {
      input.addData((1L, "ok"))
      query.processAllAvailable() // stream must NOT die
      val errors = spark.read.parquet(outDir + "_errors").collect()
      assert(errors.length === 1)
      val e = errors.head
      assert(e.getAs[Int]("attempts") === 3) // initial + 2 retries
      assert(e.getAs[Int]("status") === 500)
      assert(e.getAs[String]("message").contains("permanent 500"))
    } finally query.stop()
  }

  test("webhook-style foreachBatch sink appends idempotent batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("webhook-out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("webhook-ck").toString
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("url_hash", "status")
    val query = StreamingOps.webhookSink(df, outDir, ckDir).start()
    try {
      input.addData((1L, "ok"), (2L, "ok"))
      query.processAllAvailable()
      input.addData((3L, "failed"))
      query.processAllAvailable()
      val rows = spark.read.parquet(outDir)
      assert(rows.count() === 3)
      assert(rows.select("batch_id").distinct().count() === 2)
    } finally query.stop()
  }
}
