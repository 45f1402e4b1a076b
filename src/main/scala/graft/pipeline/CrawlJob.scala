package graft.pipeline

import graft.frontier.{Politeness, RobotsFilter, UrlSeen}
import graft.functions.UrlFunctions
import graft.model._
import graft.operators.SpanOps
import graft.sources.{SnapshotStore, SyntheticWeb}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The crawl archetype end-to-end (SURVEY.md §3.1 re-expressed):
  *
  *   pending URLs → canonicalize+hash → robots broadcast join (F1) →
  *   in-batch dedup → URL-seen layer (bloom → cuckoo → exact anti-join) →
  *   salted host-hash repartition + per-host token-bucket admission →
  *   sorted frontier snapshot → synthetic fetch → span decomposition +
  *   conversion chain → output spans + per-partition lineage metrics →
  *   outlinks feed the next round; every round commits an atomic
  *   snapshot so the job resumes from the last committed round.
  *
  * Physical-plan budget per round (scale discipline):
  *   - ONE full shuffle: the politeness repartition by salted host-hash.
  *     Admission, the sorted frontier write, the fetch and the
  *     output-span write all stay in those partitions — no re-shuffle
  *     of the heavy span payloads.
  *   - The seen-layer anti-join shuffles only the bloom/cuckoo
  *     "maybe-seen" residue (a few % of candidates at steady state).
  *   - Robots rules and host map are broadcast; the bloom is one
  *     broadcast sized ∝ seen count; cuckoo blobs are 64 fixed buckets.
  *   - Counters ride on three single-pass aggregations (robots verdict,
  *     admission flag, fetch stats) — no repeated count() jobs, no
  *     recomputation of unpersisted lineage.
  */
object CrawlJob {

  final case class PendingUrl(url: String, priority: Double, seq: Long)

  final case class FetchedRow(
      url_canon: String, url_hash: Long, host: String, round: Int,
      partition_id: Int, status: Int, bytes: Long, error: String,
      outlinks: Seq[String], doc_id: String, spans: Seq[DocSpan])

  final case class RoundStats(
      round: Int, candidates: Long, robotsDenied: Long, newUrls: Long,
      admitted: Long, deferred: Long, fetched: Long, failed: Long,
      outlinks: Long, seenTotal: Long)

  final case class CrawlSummary(rounds: Seq[RoundStats], seenTotal: Long, wallMs: Long)

  private val timing = sys.env.get("GRAFT_TIMING").contains("1")

  private def timed[A](label: String)(f: => A): A = {
    if (!timing) f
    else {
      val t0 = System.nanoTime()
      val r = f
      println(f"[crawl-timing] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
  }

  def run(
      spark: SparkSession,
      seeds: Dataset[SeedUrl],
      robots: Seq[RobotsRule],
      hostMap: Dataset[HostIps],
      universe: SyntheticWeb.Universe,
      cfg: CrawlConfig,
      storeRoot: String,
      convertOptions: ConvertPipeline.Options = ConvertPipeline.Options()
  ): CrawlSummary = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val store = new SnapshotStore(storeRoot)

    val emptySeen = Seq.empty[SeenUrl].toDF()

    // ---- resume from the last committed snapshot (north rule) ----
    val startRound = store.currentSnapshot.map(_ + 1).getOrElse(0)
    var seen: DataFrame =
      store.currentSnapshot
        .filter(store.hasTable(_, "url_seen_delta"))
        .map(c => store.readSeen(spark, c)).getOrElse(emptySeen)
    var pending: Dataset[PendingUrl] =
      if (startRound == 0) seeds.map(s => PendingUrl(s.url, s.priority, s.seq))
      else store.readOrEmpty(spark, store.currentSnapshot,
        "pending", Seq.empty[PendingUrl].toDF()).as[PendingUrl]
    var seenCount: Long = if (startRound == 0) 0L else seen.count()

    val stats = scala.collection.mutable.ArrayBuffer.empty[RoundStats]
    var round = startRound
    var continue = true

    while (continue && round < startRound + cfg.maxRounds) {
      // 1. canonicalize + hash (exact Scala canonicalizer — matches the
      //    straight-line reference model bit-for-bit)
      val canonUdf = udf(UrlFunctions.canonicalizeUrl _)
      val withCanon = pending.toDF()
        .withColumn("url_canon", canonUdf(col("url")))
        .withColumn("url_hash", UrlFunctions.urlHashCol(col("url_canon")))

      // 2. robots / allow-deny / IP-class admission (broadcast join).
      // Counters ride the pipeline via observe() — no separate job.
      val robotsObs = new org.apache.spark.sql.Observation(s"robots-$round")
      val decided = RobotsFilter.decide(spark, withCanon, "url_canon", robots, hostMap, assumeNormalized = true)
        .observe(robotsObs,
          count(lit(1)).as("total"),
          sum(when(col("robots_verdict") =!= "ok", 1L).otherwise(0L)).as("denied"))
        .persist()
      val allowed = decided.filter(col("robots_verdict") === "ok")

      // 3. in-batch dedup: one row per url_canon — best priority, first seq
      val dedup = allowed.groupBy("url_canon", "url_hash")
        .agg(max("priority").as("priority"), min("seq").as("seq"))

      // 4. URL-seen layer (bloom → cuckoo → exact anti-join)
      val bloom = timed("bloom-build")(UrlSeen.buildBloom(spark, seen,
        math.max(seenCount * 2, cfg.bloomExpectedItems), cfg.bloomFpp))
      val cuckoo = timed("cuckoo-build")(
        if (seenCount == 0) spark.emptyDataFrame
        else UrlSeen.buildCuckoo(spark, seen, math.max(seenCount * 2, 1024L)))
      val newUrls = UrlSeen.filterNew(spark, dedup, seen, bloom, cuckoo)

      // 5. frontier entries with salted host hash
      val saltUdf = udf((host: String, h: Long) => UrlFunctions.hostSalt(host, h, cfg.saltsPerHost))
      val frontier = newUrls
        .withColumn("host", UrlFunctions.hostOfCol(col("url_canon")))
        .withColumn("host_hash", saltUdf(col("host"), col("url_hash")))
        .withColumn("round", lit(round))
        .withColumn("url", col("url_canon"))
        .select("url", "url_canon", "url_hash", "host", "host_hash", "priority", "seq", "round")
        .as[FrontierEntry]

      // 6. politeness admission — THE full shuffle of the round.
      // Admission counters come from accumulators filled during the
      // cache-materializing first action (the frontier write).
      val admAcc = spark.sparkContext.longAccumulator(s"admitted-$round")
      val defAcc = spark.sparkContext.longAccumulator(s"deferred-$round")
      val admissions = Politeness.admit(spark, frontier, cfg, Some((admAcc, defAcc))).persist()
      val admitted = admissions.filter(_.admitted).map(_.entry)
      val deferred = admissions.filter(!_.admitted).map(_.entry)

      // 7. sorted frontier snapshot — already partitioned by host_hash
      //    from the admission shuffle; sort within, no re-shuffle
      timed("frontier-write")(store.write(admitted.toDF()
        .sortWithinPartitions(col("priority").desc, col("seq"), col("url_canon")),
        round, "frontier"))
      val robotsMetrics = robotsObs.get
      val candidateCount = robotsMetrics("total").asInstanceOf[Long]
      val deniedCount = robotsMetrics("denied") match {
        case null => 0L; case l: java.lang.Long => l.longValue(); case other => other.toString.toLong
      }
      val admittedCount = admAcc.value.longValue()
      val deferredCount = defAcc.value.longValue()

      // 8. fetch + decompose + convert (narrow, partition-local)
      val uni = universe
      val opts = convertOptions
      val fetched = admitted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        it.map { e =>
          val f = uni.fetch(e)
          if (f.error.nonEmpty)
            FetchedRow(f.url_canon, f.url_hash, f.host, round, pid, f.status,
              f.bytes, f.error, Nil, f.url_canon, Nil)
          else {
            val conv = ConvertPipeline(f.doc, opts)
            if (conv.isError)
              FetchedRow(f.url_canon, f.url_hash, f.host, round, pid, f.status,
                f.bytes, conv.error, f.outlinks, f.url_canon, Nil)
            else {
              val out = if (conv.docs.length == 1) conv.docs.head
                else SpanOps.merge(conv.docs, f.url_canon)
              FetchedRow(f.url_canon, f.url_hash, f.host, round, pid, f.status,
                f.bytes, "", f.outlinks, out.doc_id, out.spans)
            }
          }
        }
      }.persist()

      // 9. outputs: spans snapshot (sorted in-partition, no re-shuffle of
      //    the heavy payload) + per-partition lineage metrics
      timed("fetch+convert+spans-write")(store.write(
        fetched.filter(_.error.isEmpty).select($"doc_id", $"spans", $"round")
          .sortWithinPartitions("doc_id"),
        round, "output_spans"))

      // per-partition lineage metrics: ONE aggregation job; the rows are
      // tiny (≤ numPartitions), so global fetch stats derive locally and
      // the metrics table is written from the collected rows
      val metricsDf = fetched.toDF().groupBy("partition_id", "round").agg(
        count(lit(1)).as("urls_fetched"),
        sum(when(col("error") === "", 1L).otherwise(0L)).as("urls_converted"),
        sum("bytes").as("bytes_total"),
        sum(when(col("error") =!= "", 1L).otherwise(0L)).as("failed_count"),
        approx_count_distinct("host").as("unique_origins"),
        max_by(col("url_canon"), col("bytes")).as("heaviest_url"),
        max("bytes").as("heaviest_bytes"),
        sum(size(col("outlinks"))).as("outlinks_total"))
      val metricRows = timed("metrics-agg")(metricsDf.collect())
      val fetchedCount = metricRows.map(_.getLong(2)).sum
      val failedCount = metricRows.map(_.getLong(5)).sum
      val outlinkCount = metricRows.map(r => if (r.isNullAt(9)) 0L else r.getLong(9)).sum
      timed("metrics-write")(store.write(
        spark.createDataFrame(java.util.Arrays.asList(metricRows: _*), metricsDf.schema)
          .drop("outlinks_total"),
        round, "metrics"))

      // per-URL lineage (FIXTURES.md fetch_log): slim projection of the
      // cached fetch frame — status/bytes/error per URL, no spans
      timed("fetch-log-write")(store.write(
        fetched.toDF().select("url_canon", "url_hash", "host", "round",
          "partition_id", "status", "bytes", "error"),
        round, "fetch_log"))

      // 10. seen ∪ admitted — DELTA write only (O(new), the Iceberg
      //     append): readers union url_seen_delta across snapshots
      val newSeen = admitted.map(e => SeenUrl(e.url_canon, e.url_hash, e.round)).toDF()
      timed("seen-write")(store.write(newSeen, round, "url_seen_delta"))
      if (!cuckoo.isEmpty) timed("cuckoo-write")(store.write(cuckoo, round, "cuckoo"))

      // 11. next pending = deferred ∪ outlinks of this round
      val outlinks = fetched.flatMap { f =>
        f.outlinks.zipWithIndex.map { case (u, i) =>
          PendingUrl(u,
            priority = 1.0 / (f.round + 2),
            seq = (UrlFunctions.murmur3(f.url_canon + "#" + i).toLong & Long.MaxValue))
        }
      }
      val pendingNext = deferred
        .map(e => PendingUrl(e.url_canon, e.priority, e.seq))
        .union(outlinks)
      timed("pending-write")(store.write(pendingNext.toDF(), round, "pending"))

      // 12. atomic commit → resumable checkpoint
      store.commit(round, round, Map(
        "admitted" -> admittedCount.toString,
        "seen_total" -> (seenCount + admittedCount).toString))

      stats += RoundStats(round, candidateCount, deniedCount,
        admittedCount + deferredCount, admittedCount, deferredCount,
        fetchedCount, failedCount, outlinkCount, seenCount + admittedCount)
      seenCount += admittedCount

      // reload state from the committed snapshot (truncates lineage —
      // the equivalent of Iceberg snapshot isolation between rounds)
      seen = store.readSeen(spark, round)
      pending = store.read(spark, round, "pending").as[PendingUrl]

      decided.unpersist(); admissions.unpersist(); fetched.unpersist()

      continue = admittedCount > 0
      round += 1
    }

    CrawlSummary(stats.toSeq, seenCount, (System.nanoTime() - t0) / 1000000L)
  }
}
