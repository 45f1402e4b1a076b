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
  * Shuffle budget per round: ONE repartition (politeness, by salted
  * host-hash — also the frontier's sort partitioning) + the anti-join
  * shuffle only for bloom/cuckoo "maybe-seen" residue. Robots rules and
  * the host map are broadcast. At 1000 executors nothing here is
  * driver-bound except the bloom broadcast (sized bits ∝ seen count) and
  * the 64 cuckoo byte-blobs.
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
    val emptyPending = Seq.empty[PendingUrl].toDS()

    // ---- resume from the last committed snapshot (north rule) ----
    val startRound = store.currentSnapshot.map(_ + 1).getOrElse(0)
    var seen: DataFrame =
      store.readOrEmpty(spark, store.currentSnapshot, "url_seen", emptySeen)
    var pending: Dataset[PendingUrl] =
      if (startRound == 0) seeds.map(s => PendingUrl(s.url, s.priority, s.seq))
      else store.readOrEmpty(spark, store.currentSnapshot, "pending", emptyPending.toDF())
        .as[PendingUrl]

    val stats = scala.collection.mutable.ArrayBuffer.empty[RoundStats]
    var round = startRound
    var continue = true

    while (continue && round < startRound + cfg.maxRounds) {
      // 1. canonicalize + hash (exact Scala canonicalizer → matches the
      //    straight-line reference model bit-for-bit)
      val canonUdf = udf(UrlFunctions.canonicalizeUrl _)
      val withCanon = pending.toDF()
        .withColumn("url_canon", canonUdf(col("url")))
        .withColumn("url_hash", UrlFunctions.urlHashCol(col("url_canon")))

      // 2. robots / allow-deny / IP-class admission (broadcast join)
      val decided = RobotsFilter.decide(spark, withCanon, "url_canon", robots, hostMap)
        .persist()
      val denied = decided.filter(col("robots_verdict") =!= "ok")
      val allowed = decided.filter(col("robots_verdict") === "ok")
      val deniedCount = denied.count()

      // 3. in-batch dedup: one row per url_canon — best priority, first seq
      val dedup = allowed.groupBy("url_canon", "url_hash")
        .agg(max("priority").as("priority"), min("seq").as("seq"))

      // 4. URL-seen layer
      val seenCount = seen.count()
      val bloom = UrlSeen.buildBloom(spark, seen,
        math.max(seenCount * 2, cfg.bloomExpectedItems), cfg.bloomFpp)
      val cuckoo =
        if (seenCount == 0) spark.emptyDataFrame
        else UrlSeen.buildCuckoo(spark, seen, math.max(seenCount * 2, 1024L))
      val newUrls = UrlSeen.filterNew(spark, dedup, seen, bloom, cuckoo).persist()
      val newCount = newUrls.count()

      // 5. frontier entries with salted host hash
      val saltUdf = udf((host: String, h: Long) => UrlFunctions.hostSalt(host, h, cfg.saltsPerHost))
      val frontier = newUrls
        .withColumn("host", UrlFunctions.hostOfCol(col("url_canon")))
        .withColumn("host_hash", saltUdf(col("host"), col("url_hash")))
        .withColumn("round", lit(round))
        .withColumn("url", col("url_canon"))
        .select("url", "url_canon", "url_hash", "host", "host_hash", "priority", "seq", "round")
        .as[FrontierEntry]

      // 6. politeness admission (the single full shuffle of the round)
      val admissions = Politeness.admit(spark, frontier, cfg).persist()
      val admitted = admissions.filter(_.admitted).map(_.entry).persist()
      val deferred = admissions.filter(!_.admitted).map(_.entry)
      val admittedCount = admitted.count()

      // 7. sorted frontier snapshot: per-partition (priority DESC, seq)
      //    — the materialized min-heap order of the north rule
      val frontierSorted = admitted.toDF()
        .repartition(cfg.numPartitions, col("host_hash"))
        .sortWithinPartitions(col("priority").desc, col("seq"), col("url_canon"))
      store.write(frontierSorted, round, "frontier")

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

      val fetchedCount = fetched.count()
      val failedCount = fetched.filter(_.error.nonEmpty).count()

      // 9. outputs: spans table (sorted snapshot) + per-partition lineage
      store.write(
        fetched.filter(_.error.isEmpty).select($"doc_id", $"spans", $"round")
          .repartition(cfg.numPartitions, col("doc_id"))
          .sortWithinPartitions("doc_id"),
        round, "output_spans")

      val metrics = fetched.toDF().groupBy("partition_id", "round").agg(
        count(lit(1)).as("urls_fetched"),
        sum(when(col("error") === "", 1L).otherwise(0L)).as("urls_converted"),
        sum("bytes").as("bytes_total"),
        sum(when(col("error") =!= "", 1L).otherwise(0L)).as("failed_count"),
        approx_count_distinct("host").as("unique_origins"),
        max_by(col("url_canon"), col("bytes")).as("heaviest_url"),
        max("bytes").as("heaviest_bytes"))
      store.write(metrics, round, "metrics")

      // 10. seen ∪ admitted
      val newSeen = admitted.map(e => SeenUrl(e.url_canon, e.url_hash, e.round)).toDF()
      val seenNext = seen.unionByName(newSeen)
      store.write(seenNext.repartition(cfg.numPartitions,
        pmod(col("url_hash"), lit(UrlSeen.CuckooBuckets.toLong))), round, "url_seen")
      if (!cuckoo.isEmpty) store.write(cuckoo, round, "cuckoo")

      // 11. next pending = deferred ∪ outlinks of this round
      val outlinks = fetched.flatMap { f =>
        f.outlinks.zipWithIndex.map { case (u, i) =>
          PendingUrl(u,
            priority = 1.0 / (f.round + 2),
            seq = (UrlFunctions.murmur3(f.url_canon + "#" + i).toLong & Long.MaxValue))
        }
      }
      val outlinkCount = outlinks.count()
      val pendingNext = deferred
        .map(e => PendingUrl(e.url_canon, e.priority, e.seq))
        .union(outlinks)
      store.write(pendingNext.toDF(), round, "pending")

      // 12. atomic commit → resumable checkpoint
      store.commit(round, round, Map(
        "admitted" -> admittedCount.toString,
        "seen_total" -> (seenCount + admittedCount).toString))

      stats += RoundStats(round, pending.count(), deniedCount, newCount,
        admittedCount, admissions.filter(!_.admitted).count(), fetchedCount,
        failedCount, outlinkCount, seenCount + admittedCount)

      // reload state from the committed snapshot (truncates lineage —
      // equivalent of Iceberg snapshot isolation between rounds)
      seen = store.read(spark, round, "url_seen")
      pending = store.read(spark, round, "pending").as[PendingUrl]

      decided.unpersist(); newUrls.unpersist(); admissions.unpersist()
      admitted.unpersist(); fetched.unpersist()

      continue = admittedCount > 0
      round += 1
    }

    CrawlSummary(stats.toSeq, stats.lastOption.map(_.seenTotal).getOrElse(0L),
      (System.nanoTime() - t0) / 1000000L)
  }
}
