package graft.pipeline

import graft.datatools.Dedup
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
  *   - The seen layer touches only the bloom's "maybe-seen" residue:
  *     one cogroup shuffle against the partitioned cuckoo blobs, then a
  *     left-anti join of the double-maybe rows against the exact table.
  *   - Robots rules and host map are broadcast; the bloom is ONE
  *     driver-held filter maintained by O(delta) inserts per round (the
  *     north star mandates a broadcast bloom); cuckoo blobs live in a
  *     persisted bucket table updated executor-side with the round's
  *     delta — sketch bytes never funnel through the driver.
  *   - Counters ride on three single-pass aggregations (robots verdict,
  *     admission flag, fetch stats) — no repeated count() jobs, no
  *     recomputation of unpersisted lineage.
  */
object CrawlJob {

  final case class PendingUrl(url: String, priority: Double, seq: Long)

  final case class FetchedRow(
      url_canon: String, url_hash: Long, host: String, round: Int,
      partition_id: Int, status: Int, bytes: Long, error: String,
      outlinks: Seq[String], doc_id: String, spans: Seq[DocSpan],
      cookies_applied: Int = 0, headers_applied: Int = 0, duration_ms: Long = 0L,
      redirects: Int = 0, final_url: String = "")

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
    // a crash MID-MAINTENANCE leaves staging/backup dot-dirs whose rows
    // are invisible to readers — crawling over them would corrupt the
    // seen/corpus invariants silently. Fail fast; the dot-dirs preserve
    // every byte for repair.
    store.currentSnapshot.foreach { c =>
      val debris = store.maintenanceDebris(c)
      require(debris.isEmpty,
        s"snapshot v$c has interrupted-maintenance debris (${debris.mkString(", ")}): " +
          "repair (or remove after inspection) before resuming the crawl")
    }
    // sketch partitioning is a property of the CHECKPOINT, not the
    // caller: resuming with a different cfg.cuckooBuckets would hash
    // url_hash to the wrong bucket-N.bin, turn cuckoo "no"s into lies
    // and re-admit seen URLs — so the committed value always wins
    val cuckooBuckets: Int = store.currentSnapshot
      .flatMap(c => store.manifestMeta(c).get("cuckoo_buckets"))
      .map(_.toInt).getOrElse(cfg.cuckooBuckets)
    // same pinning for the doc-dedup shingle width: resuming with a
    // different k would band fresh signatures against incomparable
    // stored ones — the checkpoint's value wins
    val dedupShingleK: Int = store.currentSnapshot
      .flatMap(c => store.manifestMeta(c).get("dedup_k"))
      .map(_.toInt).getOrElse(cfg.dedupShingleK)
    // and the threshold: a mid-crawl switch would break the invariant
    // that the union of per-round doc_dup_pairs equals one batch LSH
    // run over all docs (CrawlDedupSpec/FIXTURES.md)
    val dedupThreshold: Double = store.currentSnapshot
      .flatMap(c => store.manifestMeta(c).get("dedup_threshold"))
      .map(_.toDouble).getOrElse(cfg.dedupThreshold)
    var seen: DataFrame =
      store.currentSnapshot
        .filter(store.hasTable(_, "url_seen_delta"))
        .map(c => store.readSeen(spark, c)).getOrElse(emptySeen)
    var pending: Dataset[PendingUrl] =
      if (startRound == 0) seeds.map(s => PendingUrl(s.url, s.priority, s.seq))
      else store.readOrEmpty(spark, store.currentSnapshot,
        "pending", Seq.empty[PendingUrl].toDF()).as[PendingUrl]
    var seenCount: Long = if (startRound == 0) 0L else seen.count()

    // ---- incremental seen-sketch state (maintenance is O(round delta);
    //      nothing below ever rebuilds from the seen union in steady
    //      state — the resume paths read the persisted sketches) ----
    // bloom: driver-held running filter; capacity fixed at creation so
    // per-round delta blooms stay merge-compatible. Persisted as a raw
    // blob file written FROM THE DRIVER (<snapshot>/bloom.bin +
    // capacity/fpp in the manifest): the filter lives on the driver, so
    // a one-row LocalRelation write would serialize the full filter
    // bytes into a task closure (the "task of very large size" warning)
    // and pay a Spark job for what is a single driver-side stream copy.
    val hadoopConf = spark.sessionState.newHadoopConf()
    val resumeMeta: Map[String, String] =
      store.currentSnapshot.map(store.manifestMeta).getOrElse(Map.empty)
    // sharded mode (10^10 escape hatch) is, like the bucket count, a
    // property of the checkpoint
    val bloomSharded: Boolean =
      resumeMeta.get("bloom_sharded").map(_.toBoolean).getOrElse(cfg.bloomSharded)
    // legacy snapshots persisted the bloom as a one-row parquet table
    val legacyBloomRow =
      if (bloomSharded) None
      else store.currentSnapshot.filter(store.hasTable(_, "bloom"))
        .map(c => store.read(spark, c, "bloom").head())
    val bloomCapacity: Long = resumeMeta.get("bloom_capacity").map(_.toLong)
      .orElse(legacyBloomRow.map(_.getLong(1)))
      .getOrElse(math.max(cfg.bloomExpectedItems, seenCount * 2))
    val bloomFpp: Double = resumeMeta.get("bloom_fpp").map(_.toDouble)
      .orElse(legacyBloomRow.map(_.getDouble(2))).getOrElse(cfg.bloomFpp)
    val bloomOpt: Option[org.apache.spark.util.sketch.BloomFilter] =
      if (bloomSharded) None // shards live beside the cuckoo blobs, executor-maintained
      else Some(store.currentSnapshot
        .flatMap(c => UrlSeen.readBloomFile(s"${store.snapshotDir(c)}/bloom.bin", hadoopConf))
        .orElse(legacyBloomRow.map(r => UrlSeen.bloomFromBytes(r.getAs[Array[Byte]](0))))
        .getOrElse {
          if (seenCount > 0) UrlSeen.bloomOfDelta(seen, bloomCapacity, bloomFpp) // legacy rebuild
          else UrlSeen.emptyBloom(bloomCapacity, bloomFpp)
        })
    var bloomBcOpt = bloomOpt.map(spark.sparkContext.broadcast(_))

    // cuckoo: persisted (bucket, filter_bytes) parquet table (canonical,
    // resume source) + per-bucket raw blob FILES under
    // <snapshot>/cuckoo_bin (the lookup path: executors read their
    // bucket straight from storage — puffin-style sketch files)
    val perBucketCapacity = math.max(1024L, bloomCapacity / cuckooBuckets)
    var cuckoo: DataFrame = store.currentSnapshot.filter(store.hasTable(_, "cuckoo"))
      .map(c => store.read(spark, c, "cuckoo"))
      .getOrElse {
        if (seenCount == 0) UrlSeen.emptyCuckooState(spark)
        else UrlSeen.updateCuckoo(spark, UrlSeen.emptyCuckooState(spark), // legacy one-time rebuild
          seen.select("url_hash"), perBucketCapacity, cuckooBuckets).persist()
      }
    var cuckooDir: Option[String] = store.currentSnapshot
      .map(c => s"${store.snapshotDir(c)}/cuckoo_bin")
      .filter(UrlSeen.cuckooFilesReady)

    // sharded mode's shard source. Normally the shards live beside the
    // cuckoo blobs (they ride the same cogroup), but a checkpoint that
    // PREDATES sharded mode (seen rows, no bloom-*.bin) must not start
    // its shards empty: the first rounds would answer "definitely new"
    // for historical URLs — a bloom false NEGATIVE that skips the cuckoo
    // and exact layers entirely and re-admits seen URLs. The resume path
    // seeds the shards ONCE from the full seen table (the sharded twin
    // of the legacy broadcast-bloom rebuild) into an auxiliary dir.
    var bloomShardDir: Option[String] =
      if (!bloomSharded) None
      else cuckooDir.filter(d => UrlSeen.bloomShardsPresent(d, hadoopConf)) match {
        case ready @ Some(_) => ready
        case None if seenCount > 0 =>
          val dir = s"${store.snapshotDir(store.currentSnapshot.get)}/bloom_seed_bin"
          if (!UrlSeen.bloomShardsPresent(dir, hadoopConf))
            UrlSeen.seedBloomShards(spark, seen, dir,
              math.max(1024L, bloomCapacity / cuckooBuckets), bloomFpp, cuckooBuckets)
          Some(dir)
        case None => None // cold start: empty shards are honestly empty
      }

    val stats = scala.collection.mutable.ArrayBuffer.empty[RoundStats]
    var round = startRound
    var continue = true

    // The round's output tables (spans aside) are independent jobs over
    // cached frames — submit them CONCURRENTLY so their fixed costs
    // (driver-side planning, job scheduling, parquet commit) overlap
    // instead of summing. ~10 serial job submissions per round was the
    // Amdahl fixed term that capped measured N→4N scaling efficiency.
    // rejection handler runs the task INLINE instead of aborting: every
    // job is awaited before the pool shuts down, so anything submitted
    // during shutdown is a completion callback racing the final await —
    // cheap, and correct to run on the submitting thread (parasitic
    // semantics) rather than printed as a scary stack trace or dropped.
    val ioPool = new java.util.concurrent.ThreadPoolExecutor(6, 6,
      0L, java.util.concurrent.TimeUnit.MILLISECONDS,
      new java.util.concurrent.LinkedBlockingQueue[Runnable](),
      (r: Runnable) => { val t = new Thread(r, "graft-round-io"); t.setDaemon(true); t },
      (r: Runnable, _: java.util.concurrent.ThreadPoolExecutor) => r.run())
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(ioPool)
    def job[A](label: String)(f: => A): scala.concurrent.Future[A] =
      scala.concurrent.Future {
        SparkSession.setActiveSession(spark)
        // thread-local: names this job's stages for the UI + profilers
        spark.sparkContext.setJobDescription(label)
        timed(label)(f)
      }
    def await[A](f: scala.concurrent.Future[A]): A =
      scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf)

    try {
    while (continue && round < startRound + cfg.maxRounds) {
      // 0. clear any dangling v<round> dir — a crashed attempt or an
      //    interrupted rollback may have left tables this attempt won't
      //    overwrite, and commit manifests every dir it finds
      store.clearStaged(round)

      // 1. canonicalize + hash via the native codegen expression — the
      //    single-pass parser inside WholeStageCodegen (no scalar UDF, no
      //    regex stack; UrlExprParitySpec pins equality with both twins)
      val withCanon = pending.toDF()
        .withColumn("url_canon", graft.functions.UrlExprs.canonicalize(col("url")))
        .withColumn("url_hash", UrlFunctions.urlHashCol(col("url_canon")))

      // 2. robots / allow-deny / IP-class admission (broadcast join).
      // Counters ride the pipeline via observe() — no separate job.
      val robotsObs = new org.apache.spark.sql.Observation(s"robots-$round")
      // not persisted: the chain below it is materialized by exactly one
      // action (the frontier write; everything downstream reads the
      // admissions cache), so caching 10^6+ rows here is a pure write
      val decidedRaw = RobotsFilter.decide(spark, withCanon, "url_canon", robots, hostMap, assumeNormalized = true)
      val decided = decidedRaw
        .observe(robotsObs,
          count(lit(1)).as("total"),
          sum(when(col("robots_verdict") =!= "ok", 1L).otherwise(0L)).as("denied"))
      val allowed = decided.filter(col("robots_verdict") === "ok")

      // 3. in-batch dedup: one row per url_canon — best priority, first
      //    seq. Keyed on url_canon ALONE (url_hash is functionally
      //    dependent) so this exchange is REUSED by the exact anti-join
      //    downstream — one shuffle, not two.
      val dedup = allowed.groupBy("url_canon")
        .agg(max("url_hash").as("url_hash"),
          max("priority").as("priority"), min("seq").as("seq"))

      // 4. URL-seen layer (running bloom → persisted cuckoo → exact
      //    anti-join); both sketches were maintained incrementally at the
      //    end of the previous round — nothing is rebuilt here
      val bloomLayer: UrlSeen.BloomLayer = bloomBcOpt match {
        case Some(bc) => UrlSeen.BroadcastBloom(bc)
        case None => bloomShardDir.map(UrlSeen.ShardedBloom.apply).getOrElse(UrlSeen.NoBloom)
      }
      val newUrls = UrlSeen.filterNew(spark, dedup, seen, bloomLayer, cuckooDir, cuckooBuckets)

      // 5. frontier entries with salted host hash (codegen Column twin).
      // `url` always equals `url_canon` at this point, so it rides the
      // round's ONE full shuffle as an empty string (~35% of the
      // entry's string bytes) and is restored after admission — shuffle
      // bytes are the memory traffic that inflates task time at high
      // parallelism.
      val frontier = newUrls
        .withColumn("host", graft.functions.UrlExprs.host(col("url_canon")))
        .withColumn("host_hash",
          UrlFunctions.hostSaltCol(col("host"), col("url_hash"), cfg.saltsPerHost))
        .withColumn("round", lit(round))
        .withColumn("url", lit(""))
        .select("url", "url_canon", "url_hash", "host", "host_hash", "priority", "seq", "round")
        .as[FrontierEntry]

      // 6. politeness admission — THE full shuffle of the round.
      // Admission counters come from accumulators filled during the
      // cache-materializing first action (the frontier write).
      val admAcc = spark.sparkContext.longAccumulator(s"admitted-$round")
      val defAcc = spark.sparkContext.longAccumulator(s"deferred-$round")
      val admissions = Politeness.admit(spark, frontier, cfg, Some((admAcc, defAcc))).persist()
      // columnar split (no per-row Admission object churn): the typed
      // view is only re-materialized where the fetch genuinely needs
      // FrontierEntry objects
      val admitted = admissions.toDF().filter(col("admitted"))
        .select("entry.*").as[FrontierEntry]

      // 7. sorted frontier snapshot — already partitioned by host_hash
      //    from the admission shuffle; sort within, no re-shuffle.
      //    `url` (blanked for the shuffle) is restored for the table.
      spark.sparkContext.setJobDescription("frontier-write")
      timed("frontier-write")(store.write(admitted.toDF()
        .withColumn("url", col("url_canon"))
        .sortWithinPartitions(col("priority").desc, col("seq"), col("url_canon")),
        round, "frontier"))
      val robotsMetrics = robotsObs.get
      val (candidateCount, deniedCount) =
        if (robotsMetrics.contains("total"))
          (robotsMetrics("total").asInstanceOf[Long], robotsMetrics("denied") match {
            case null => 0L; case l: java.lang.Long => l.longValue(); case other => other.toString.toLong
          })
        else {
          // AQE's empty-relation propagation can excise the
          // CollectMetrics node when EVERY row of the round is filtered
          // out downstream (an all-denied or all-seen round): once a
          // shuffle stage materializes empty, the re-optimized final
          // plan carries no observed metrics and the Observation
          // resolves to an empty map. Re-derive the two counters with
          // one tiny job over the pre-observe frame — a round that
          // trips this is by construction near-empty.
          val r = decidedRaw.agg(count(lit(1)),
            sum(when(col("robots_verdict") =!= "ok", 1L).otherwise(0L))).head()
          (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
        }
      val admittedCount = admAcc.value.longValue()
      val deferredCount = defAcc.value.longValue()

      // 8. fetch + decompose + convert (narrow, partition-local)
      val uni = universe
      val opts = convertOptions
      val hardTimeoutMs = cfg.softTimeoutMs + 5000L // api/api.go:511 grace
      val fetched = admitted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        it.map { e =>
          val f = uni.fetch(e)
          if (f.error.nonEmpty)
            FetchedRow(f.url_canon, f.url_hash, f.host, round, pid, f.status,
              f.bytes, f.error, Nil, f.url_canon, Nil,
              duration_ms = f.duration_ms, redirects = f.redirects, final_url = f.final_url)
          else if (f.duration_ms > hardTimeoutMs)
            // per-row deadline budget: a hung fetch routes to the error
            // channel (ErrFiltered-style classification) instead of
            // occupying the slot — outlinks are NOT followed, matching
            // the reference's cancelled-context semantics
            FetchedRow(f.url_canon, f.url_hash, f.host, round, pid, f.status,
              f.bytes, s"deadline: fetch exceeded hard timeout (${hardTimeoutMs}ms)",
              Nil, f.url_canon, Nil,
              f.cookies_applied, f.headers_applied, f.duration_ms,
              f.redirects, f.final_url)
          else if (f.status == 301 || f.status == 302)
            // redirect: no content to convert; the Location target rides
            // outlinks so next round's FULL admission stack re-validates
            // the hop (robots/IP-class — the outbound.go:356-392 posture)
            // and the seen layer extinguishes cycles
            FetchedRow(f.url_canon, f.url_hash, f.host, round, pid, f.status,
              f.bytes, "", f.outlinks, f.url_canon, Nil,
              f.cookies_applied, f.headers_applied, f.duration_ms,
              f.redirects, f.final_url)
          else {
            val conv = ConvertPipeline(f.doc, opts)
            if (conv.isError)
              FetchedRow(f.url_canon, f.url_hash, f.host, round, pid, f.status,
                f.bytes, conv.error, f.outlinks, f.url_canon, Nil,
                f.cookies_applied, f.headers_applied, f.duration_ms,
                f.redirects, f.final_url)
            else {
              val out = if (conv.docs.length == 1) conv.docs.head
                else SpanOps.merge(conv.docs, f.url_canon)
              FetchedRow(f.url_canon, f.url_hash, f.host, round, pid, f.status,
                f.bytes, "", f.outlinks, out.doc_id, out.spans,
                f.cookies_applied, f.headers_applied, f.duration_ms,
                f.redirects, f.final_url)
            }
          }
        }
      }.persist()

      // 9. outputs: spans snapshot (sorted in-partition, no re-shuffle of
      //    the heavy payload) + per-partition lineage metrics
      spark.sparkContext.setJobDescription("spans-write")
      timed("fetch+convert+spans-write")(store.write(
        fetched.filter(r => r.error.isEmpty && r.status == 200)
          .select($"doc_id", $"spans", $"round")
          .sortWithinPartitions("doc_id"),
        round, "output_spans"))

      // ---- steps 9-11 are independent jobs over the cached frames;
      //      each runs on the io pool, awaited together before commit ----

      // per-partition lineage metrics: ONE aggregation job; the rows are
      // tiny (≤ numPartitions), so global fetch stats derive locally and
      // the metrics table is written from the collected rows
      val metricsDf = fetched.toDF().groupBy("partition_id", "round").agg(
        count(lit(1)).as("urls_fetched"),
        sum(when(col("error") === "" && col("status") === 200, 1L).otherwise(0L))
          .as("urls_converted"),
        sum("bytes").as("bytes_total"),
        sum(when(col("error") =!= "", 1L).otherwise(0L)).as("failed_count"),
        approx_count_distinct("host").as("unique_origins"),
        max_by(col("url_canon"), col("bytes")).as("heaviest_url"),
        max("bytes").as("heaviest_bytes"),
        sum(size(col("outlinks"))).as("outlinks_total"),
        // appended LAST: the positional reads below (urls_fetched at 2,
        // failed_count at 5, outlinks_total at 9) must stay stable
        sum(col("redirects").cast("long")).as("redirects_total"))
      val metricsFut = job("metrics") {
        val rows = metricsDf.collect()
        store.write(spark.createDataFrame(java.util.Arrays.asList(rows: _*), metricsDf.schema)
          .drop("outlinks_total").coalesce(1), round, "metrics")
        rows
      }

      // per-URL lineage (FIXTURES.md fetch_log): slim projection of the
      // cached fetch frame — status/bytes/error per URL, no spans
      val fetchLogFut = job("fetch-log-write")(store.write(
        fetched.toDF().select("url_canon", "url_hash", "host", "round",
          "partition_id", "status", "bytes", "error",
          "cookies_applied", "headers_applied", "duration_ms",
          "redirects", "final_url"),
        round, "fetch_log"))

      // 9b. OPT-IN incremental doc near-dup: this round's converted
      // docs dedup against the ACCUMULATED minhash_index (delta-append
      // like url_seen_delta) — prior rounds' signatures are read from
      // the store, never recomputed, and prior rounds' span text is
      // fetched only for verified-candidate doc ids (left-semi inside
      // minhashIncrementalPairs). Two per-round delta outputs:
      // doc_dup_pairs and this round's minhash_index rows. The seen
      // layer guarantees each doc_id is fetched in exactly one round,
      // so delta ids are disjoint from the index by construction.
      val dedupFut: scala.concurrent.Future[Any] =
        if (!cfg.dedupDocs) scala.concurrent.Future.successful(())
        else job("doc-dedup") {
          def docText(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
            expr("array_join(transform(spans, s -> s.text), ' ')").as("text"))
          val docsRound = docText(fetched.toDF()
            .filter(col("error") === "" && col("status") === 200))
          val havePrior = (0 until round).exists(store.hasTable(_, "minhash_index"))
          val (corpus, index) =
            if (havePrior)
              (docText(store.readDeltas(spark, round - 1, "output_spans")),
                store.readDeltas(spark, round - 1, "minhash_index"))
            else
              (docsRound.limit(0),
                Dedup.minhashIndex(docsRound.limit(0), k = dedupShingleK, seed = cfg.seed))
          val (pairs, deltaIndex, caches) = Dedup.minhashIncrementalPairsWithCaches(
            docsRound, corpus, index,
            k = dedupShingleK, threshold = dedupThreshold, seed = cfg.seed)
          store.write(pairs.withColumn("round", lit(round)), round, "doc_dup_pairs")
          // `round` makes the index compactable (hidden-partitioned by
          // round) under cfg.compactEvery maintenance
          store.write(deltaIndex.withColumn("round", lit(round)), round, "minhash_index")
          // release the stage's caches — a long crawl must not
          // accumulate per-round cached frames (the admissions/fetched
          // discipline of the main loop)
          caches.foreach(_.unpersist())
        }

      // 10. seen ∪ admitted — DELTA write only (O(new), the Iceberg
      //     append): readers union url_seen_delta across snapshots.
      //     Both sketches fold in ONLY this round's delta:
      //       - bloom: collect+insert for small deltas (O(delta·8B)
      //         through the driver), distributed OR-merge otherwise;
      //         then re-broadcast + a driver-side blob-file write
      //       - cuckoo: executor-side cogroup of delta hashes with the
      //         persisted blobs; bytes never visit the driver
      val newSeen = admitted.toDF().select(col("url_canon"), col("url_hash"),
        col("round").as("round_first_seen"))
      val seenFut = job("seen-write")(store.write(newSeen, round, "url_seen_delta"))

      val bloomFut: scala.concurrent.Future[Any] =
        if (bloomSharded) scala.concurrent.Future.successful(()) // shards ride the cuckoo job
        else job("bloom-update") {
          val bloom = bloomOpt.get
          if (admittedCount > 0) {
            if (admittedCount <= cfg.bloomCollectThreshold)
              admitted.toDF().select(col("url_hash")).as[Long].collect().foreach(bloom.putLong)
            else
              bloom.mergeInPlace(UrlSeen.bloomOfDelta(newSeen, bloomCapacity, bloomFpp))
            // unpersist (not destroy): cached lineage from this round may
            // still reference the old broadcast; a re-fetch would resend
            // the mutated bloom, which only ADDS keys — extra maybe-seen
            // rows are re-confirmed by the exact layer, never dropped
            val oldBc = bloomBcOpt.get
            bloomBcOpt = Some(spark.sparkContext.broadcast(bloom))
            oldBc.unpersist(blocking = false)
          }
          UrlSeen.writeBloomFile(bloom, s"${store.snapshotDir(round)}/bloom.bin", hadoopConf)
        }

      // sharded mode: the bloom shards fold the SAME delta inside the
      // cuckoo cogroup, reading each bucket's previous shard from the
      // previous round's dir — no driver bytes, no broadcast
      // shard lineage follows bloomShardDir (not cuckooDir): on a seeded
      // resume the previous shards live in the auxiliary seed dir
      val shardSpec =
        if (bloomSharded) Some(UrlSeen.BloomShardSpec(bloomShardDir,
          math.max(1024L, bloomCapacity / cuckooBuckets), bloomFpp))
        else None
      val cuckooFut = job("cuckoo-write") {
        // ONE job feeds both layouts: the fused cogroup writes each
        // bucket's blob file as it computes the bytes, and the action
        // that drives it is the canonical parquet write (resume source).
        // `_DONE` marks the blob dir only after that action succeeds.
        val binDir = s"${store.snapshotDir(round)}/cuckoo_bin"
        store.write(UrlSeen.updateCuckoo(spark, cuckoo,
          newSeen.select("url_hash"), perBucketCapacity, cuckooBuckets,
          blobDir = Some(binDir), bloomShards = shardSpec), round, "cuckoo")
        UrlSeen.finishCuckooDir(binDir, hadoopConf)
      }

      // 11. next pending = deferred ∪ outlinks of this round — fully
      // columnar (codegen posexplode + hash; no PendingUrl object per
      // outlink). `hash()` IS UrlFunctions.murmur3 (Murmur3_x86_32,
      // seed 42, UTF-8 bytes), so seq values are bit-identical to the
      // reference model's — DeterminismSpec/CrawlJobSpec pin it.
      val outlinks = fetched.toDF()
        .select(col("url_canon"), col("round"),
          posexplode(col("outlinks")).as(Seq("i", "url")))
        .select(col("url"),
          (lit(1.0) / (col("round") + lit(2))).as("priority"),
          hash(concat(col("url_canon"), lit("#"), col("i").cast("string")))
            .cast("long").bitwiseAND(lit(Long.MaxValue)).as("seq"))
      val pendingNext = admissions.toDF().filter(!col("admitted"))
        .select(col("entry.url_canon").as("url"), col("entry.priority").as("priority"),
          col("entry.seq").as("seq"))
        .unionByName(outlinks)
      val pendingFut = job("pending-write")(store.write(pendingNext, round, "pending"))

      // barrier: everything staged under v<round> must exist before the
      // atomic commit makes the snapshot visible
      val metricRows = await(metricsFut)
      val fetchedCount = metricRows.map(_.getLong(2)).sum
      val failedCount = metricRows.map(_.getLong(5)).sum
      val outlinkCount = metricRows.map(r => if (r.isNullAt(9)) 0L else r.getLong(9)).sum
      Seq(fetchLogFut, seenFut, bloomFut, cuckooFut, pendingFut, dedupFut).foreach(await)

      // 12. atomic commit → resumable checkpoint. With cfg.wapAudit the
      // commit splits into Iceberg's write–audit–publish: stage the
      // snapshot (CURRENT untouched — readers and a crashed/resumed run
      // still see the last good round), audit the staged seen delta by
      // explicit id, and publish only on a pass; a failure abandons the
      // staged dir and fails the round with durable state intact.
      val commitMeta = Map(
        "admitted" -> admittedCount.toString,
        "seen_total" -> (seenCount + admittedCount).toString,
        "cuckoo_buckets" -> cuckooBuckets.toString,
        "bloom_capacity" -> bloomCapacity.toString,
        "bloom_fpp" -> bloomFpp.toString,
        "bloom_sharded" -> bloomSharded.toString) ++
        (if (cfg.dedupDocs) Map(
          "dedup_k" -> dedupShingleK.toString,
          "dedup_threshold" -> dedupThreshold.toString) else Map.empty)
      if (cfg.wapAudit) {
        store.stage(round, round, commitMeta)
        spark.sparkContext.setJobDescription("wap-audit")
        // structural audit over the STAGED snapshot: the seen delta must
        // carry exactly the admitted rows, every row canonical and
        // stamped with this round — one count-shaped aggregate
        val audited =
          if (!store.hasTable(round, "url_seen_delta")) (0L, 0L)
          else {
            val r = store.read(spark, round, "url_seen_delta").agg(
              count(lit(1)),
              coalesce(sum(when(col("url_canon").isNull ||
                col("round_first_seen") =!= round, 1L).otherwise(0L)), lit(0L))).head()
            (r.getLong(0), r.getLong(1))
          }
        if (audited._1 != admittedCount || audited._2 != 0L) {
          store.abandon(round)
          throw new IllegalStateException(
            s"WAP audit failed for round $round: delta rows ${audited._1} " +
              s"(expected $admittedCount), bad rows ${audited._2}; " +
              "snapshot abandoned, CURRENT unchanged")
        }
        store.publish(round)
      } else store.commit(round, round, commitMeta)

      stats += RoundStats(round, candidateCount, deniedCount,
        admittedCount + deferredCount, admittedCount, deferredCount,
        fetchedCount, failedCount, outlinkCount, seenCount + admittedCount)
      seenCount += admittedCount

      // 12b. OPT-IN snapshot maintenance (Iceberg rewrite_data_files +
      // expire_snapshots): fold the cross-round delta tables into the
      // snapshot just committed and delete the subsumed ones. Runs
      // AFTER the commit (the checkpoint is durable either way) and
      // BEFORE the state reload below, so the reloaded frames plan over
      // the post-maintenance file set — never over paths expiry removed.
      if (cfg.compactEvery > 0 && (round + 1) % cfg.compactEvery == 0) {
        spark.sparkContext.setJobDescription("snapshot-maintenance")
        timed("compact+expire") {
          // a table may exist only in EARLIER snapshots (an empty round,
          // or dedupDocs toggled off after indexed rounds) — the guard
          // must scan the whole history or expiry would strand live rows
          def anywhere(t: String) = (0 to round).exists(store.hasTable(_, t))
          // small metadata tables: REWRITE-compact (packs 10⁴ rounds of
          // tiny delta files into one fat file per round-partition)
          store.compactDeltas(spark, round, "url_seen_delta")
          if (anywhere("minhash_index"))
            store.compactDeltas(spark, round, "minhash_index", roundCol = "round")
          // heavy history tables (the corpus + lineage): RENAME-only
          // relocation — maintenance must never rewrite the 100-TB
          // payload, and expiry must never delete live rows of it
          Seq("output_spans", "fetch_log", "doc_dup_pairs", "metrics")
            .filter(anywhere).foreach(t => store.relocateDeltas(round, t))
          store.expireSnapshots()
        }
      }

      // reload state from the committed snapshot (truncates lineage —
      // the equivalent of Iceberg snapshot isolation between rounds)
      seen = store.readSeen(spark, round)
      pending = store.read(spark, round, "pending").as[PendingUrl]
      cuckoo = store.read(spark, round, "cuckoo")
      cuckooDir = Some(s"${store.snapshotDir(round)}/cuckoo_bin")
      if (bloomSharded) bloomShardDir = cuckooDir // shards rode this round's cogroup

      admissions.unpersist(); fetched.unpersist()

      continue = admittedCount > 0
      round += 1
    }
    } finally ioPool.shutdown()

    CrawlSummary(stats.toSeq, seenCount, (System.nanoTime() - t0) / 1000000L)
  }
}
