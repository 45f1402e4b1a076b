package graft

import graft.frontier.UrlSeen
import graft.model.CrawlConfig
import graft.pipeline.CrawlJob
import graft.sources.{SnapshotStore, SyntheticWeb}
import graft.testkit.ReferenceCrawl
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** End-to-end crawl vs the straight-line reference model: final URL-seen
  * set, per-round canonical frontier order, and output span-sequence
  * equality (kind, text, media_ref, order) — the BASELINE.json
  * correctness gates.
  */
class CrawlJobSpec extends SparkSpec {

  private val universe = SyntheticWeb.Universe(numHosts = 23, pagesPerHost = 40,
    seed = 7L, outlinksPerDoc = 3, spansPerDoc = 5)
  private val cfg = CrawlConfig(numPartitions = 8, saltsPerHost = 2,
    hostBudgetPerRound = 4, maxRounds = 3, bloomExpectedItems = 1 << 12)
  private val robots = SyntheticWeb.defaultRobots
  private val hostMap = SyntheticWeb.hostMap(universe.numHosts)
  private val seeds = universe.seedUrls(60)

  private def runEngine(root: String): CrawlJob.CrawlSummary = {
    import spark.implicits._
    CrawlJob.run(spark, seeds.toDS(), robots, hostMap.toDS(), universe, cfg, root)
  }

  lazy val model: ReferenceCrawl.Result =
    ReferenceCrawl.run(seeds, robots, hostMap.map(h => h.host -> h.ips).toMap, universe, cfg)

  lazy val storeRoot: String = Files.createTempDirectory("crawl-spec").toString
  lazy val summary: CrawlJob.CrawlSummary = runEngine(storeRoot)

  test("final URL-seen set matches the reference model") {
    val store = new SnapshotStore(storeRoot)
    summary // force
    val last = store.currentSnapshot.get
    val engineSeen = store.readSeen(spark, last)
      .select("url_canon", "round_first_seen")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(engineSeen === model.seen)
  }

  test("per-round frontier canonical order matches the reference model") {
    summary
    val store = new SnapshotStore(storeRoot)
    model.rounds.foreach { rt =>
      val engineOrder = store.read(spark, rt.round, "frontier")
        .orderBy(col("host_hash"), col("priority").desc, col("seq"), col("url_canon"))
        .select("url_canon").collect().map(_.getString(0)).toSeq
      assert(engineOrder === rt.admittedOrdered, s"round ${rt.round}")
    }
  }

  test("output spans satisfy span-sequence equality vs the model") {
    summary
    val store = new SnapshotStore(storeRoot)
    model.rounds.foreach { rt =>
      val engineDocs = store.read(spark, rt.round, "output_spans")
        .selectExpr("doc_id",
          "transform(spans, s -> struct(s.kind, s.text, s.media_ref, s.offset)) as spans")
        .collect()
        .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(s => (s.getString(0), s.getString(1), s.getString(2), s.getInt(3))))
        .toMap
      val modelDocs = rt.fetchedDocs.map { case (id, d) =>
        id -> d.spans.map(s => (s.kind, s.text, s.media_ref, s.offset))
      }
      assert(engineDocs.keySet === modelDocs.keySet, s"round ${rt.round} doc ids")
      modelDocs.foreach { case (id, spans) =>
        assert(engineDocs(id) === spans, s"round ${rt.round} doc $id")
      }
    }
  }

  test("crawl is resumable from the committed snapshot") {
    summary
    val store = new SnapshotStore(storeRoot)
    val before = store.currentSnapshot.get
    // continue for 1 more round from the checkpoint
    import spark.implicits._
    val more = CrawlJob.run(spark, seeds.toDS(), robots, hostMap.toDS(), universe,
      cfg.copy(maxRounds = 1), storeRoot)
    val after = store.currentSnapshot.get
    assert(after === before + 1)
    // model run for 4 rounds total must agree with the resumed engine
    val model4 = ReferenceCrawl.run(seeds, robots,
      hostMap.map(h => h.host -> h.ips).toMap, universe, cfg.copy(maxRounds = 4))
    val engineSeen = store.readSeen(spark, after)
      .select("url_canon", "round_first_seen")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(engineSeen === model4.seen)
    assert(more.rounds.nonEmpty)
  }

  test("bloomSharded crawl matches the reference model (10^10 escape-hatch path)") {
    import spark.implicits._
    val root = Files.createTempDirectory("crawl-sharded").toString
    CrawlJob.run(spark, seeds.toDS(), robots, hostMap.toDS(), universe,
      cfg.copy(bloomSharded = true), root)
    val store = new SnapshotStore(root)
    val last = store.currentSnapshot.get
    assert(store.manifestMeta(last)("bloom_sharded") === "true")
    // no driver bloom file is written; shards live beside the cuckoo blobs
    assert(!Files.exists(java.nio.file.Paths.get(store.snapshotDir(last), "bloom.bin")))
    val binFiles = new java.io.File(store.snapshotDir(last), "cuckoo_bin").list()
    assert(binFiles.exists(_.startsWith("bloom-")), binFiles.mkString(","))
    val engineSeen = store.readSeen(spark, last)
      .select("url_canon", "round_first_seen")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(engineSeen === model.seen)
  }

  test("sharded resume of a pre-sharded checkpoint seeds shards from the seen table") {
    import spark.implicits._
    val root = Files.createTempDirectory("crawl-shard-seed").toString
    // rounds 0-1 in broadcast-bloom mode
    CrawlJob.run(spark, seeds.toDS(), robots, hostMap.toDS(), universe,
      cfg.copy(maxRounds = 2, bloomSharded = false), root)
    val store = new SnapshotStore(root)
    val ckpt = store.currentSnapshot.get
    // simulate a checkpoint that PREDATES sharded mode: its manifest has
    // no bloom_sharded key, so resume falls back to the caller's cfg
    val mf = java.nio.file.Paths.get(store.snapshotDir(ckpt), "MANIFEST.json")
    Files.writeString(mf,
      Files.readString(mf).replace("\"bloom_sharded\"", "\"legacy_stripped\""))
    assert(!store.manifestMeta(ckpt).contains("bloom_sharded"))
    // resume WITH bloomSharded=true: without the one-time shard seed the
    // first rounds would build shards from the round delta only, answer
    // "definitely new" for historical URLs (bloom false NEGATIVE,
    // skipping cuckoo AND the exact anti-join) and re-admit them
    CrawlJob.run(spark, seeds.toDS(), robots, hostMap.toDS(), universe,
      cfg.copy(maxRounds = 2, bloomSharded = true), root)
    // the seed dir was built next to the pre-sharded checkpoint
    assert(UrlSeen.bloomShardsPresent(s"${store.snapshotDir(ckpt)}/bloom_seed_bin",
      spark.sessionState.newHadoopConf()))
    val last = store.currentSnapshot.get
    val model4 = ReferenceCrawl.run(seeds, robots,
      hostMap.map(h => h.host -> h.ips).toMap, universe, cfg.copy(maxRounds = 4))
    val seenRows = store.readSeen(spark, last)
      .select("url_canon", "round_first_seen")
      .collect().map(r => r.getString(0) -> r.getInt(1))
    // no duplicate url_canon rows (re-admission would duplicate), and
    // the map equals the 4-round straight-line model exactly
    assert(seenRows.length === seenRows.map(_._1).distinct.length)
    assert(seenRows.toMap === model4.seen)
  }

  test("resume adopts the checkpoint's cuckoo bucket count (manifest wins over cfg)") {
    import spark.implicits._
    val root = Files.createTempDirectory("crawl-buckets").toString
    CrawlJob.run(spark, seeds.toDS(), robots, hostMap.toDS(), universe,
      cfg.copy(maxRounds = 2, cuckooBuckets = 16), root)
    // resume with a DIFFERENT configured bucket count: the persisted
    // value must win — otherwise seen hashes would read the wrong
    // bucket-N.bin, the sketch "no" would lie, and seen URLs would be
    // re-admitted (duplicate crawl + duplicate seen rows)
    CrawlJob.run(spark, seeds.toDS(), robots, hostMap.toDS(), universe,
      cfg.copy(maxRounds = 2, cuckooBuckets = 64), root)
    val store = new SnapshotStore(root)
    val last = store.currentSnapshot.get
    assert(store.manifestMeta(last)("cuckoo_buckets") === "16")
    val model4 = ReferenceCrawl.run(seeds, robots,
      hostMap.map(h => h.host -> h.ips).toMap, universe, cfg.copy(maxRounds = 4))
    val engineSeen = store.readSeen(spark, last)
      .select("url_canon", "round_first_seen")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(engineSeen === model4.seen)
  }

  test("snapshot time travel: older committed rounds stay readable after later commits") {
    summary
    val store = new SnapshotStore(storeRoot)
    val last = store.currentSnapshot.get
    assert(last >= 1)
    // round-0 seen is a strict subset of the latest seen
    val seen0 = store.readSeen(spark, 0).select("url_canon")
      .collect().map(_.getString(0)).toSet
    val seenN = store.readSeen(spark, last).select("url_canon")
      .collect().map(_.getString(0)).toSet
    assert(seen0.subsetOf(seenN) && seen0.size < seenN.size)
    // manifests exist per committed snapshot
    (0 to last).foreach { r => assert(store.readManifest(r).contains("\"round\"")) }
  }

  test("in-crawl snapshot maintenance (compactEvery) preserves the seen set and resume") {
    // same crawl with the opt-in compact+expire stage firing mid-run
    // (after round 1: (1+1) % 2 == 0) must land on the reference model's
    // seen set, with the subsumed snapshots actually gone from disk.
    val root = Files.createTempDirectory("crawl-compact").toString
    import spark.implicits._
    CrawlJob.run(spark, seeds.toDS(), robots, hostMap.toDS(), universe,
      cfg.copy(compactEvery = 2), root)
    val store = new SnapshotStore(root)
    val last = store.currentSnapshot.get
    val engineSeen = store.readSeen(spark, last)
      .select("url_canon", "round_first_seen")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(engineSeen === model.seen)
    // round-1 compaction expired v0; the base and everything after survive
    assert(!Files.exists(java.nio.file.Paths.get(store.snapshotDir(0))))
    assert(store.compactedTables(1).contains("url_seen_delta"))
    // expiry is Iceberg-faithful: the HISTORY tables survive it in full.
    // output spans were relocated (rename-only) into the base, so the
    // cumulative corpus equals the model's fetched docs across rounds,
    // and per-URL lineage keeps one fetch_log row per fetched URL
    assert(store.compactedTables(1).contains("output_spans"))
    val engineDocs = store.readDeltas(spark, last, "output_spans")
      .select("doc_id").collect().map(_.getString(0)).toSet
    assert(engineDocs === model.rounds.flatMap(_.fetchedDocs.keys).toSet)
    val logged = store.readDeltas(spark, last, "fetch_log")
      .select("url_canon").collect().map(_.getString(0)).toSet
    assert(logged === model.rounds.flatMap(_.admittedOrdered).toSet)
    // resume FROM a maintained checkpoint: 1 more round, model agreement
    CrawlJob.run(spark, seeds.toDS(), robots, hostMap.toDS(), universe,
      cfg.copy(maxRounds = 1, compactEvery = 2), root)
    val model4 = ReferenceCrawl.run(seeds, robots,
      hostMap.map(h => h.host -> h.ips).toMap, universe, cfg.copy(maxRounds = 4))
    val resumedSeen = store.readSeen(spark, store.currentSnapshot.get)
      .select("url_canon", "round_first_seen")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(resumedSeen === model4.seen)
  }

  test("resume fails fast on interrupted-maintenance debris (rows parked in dot-dirs)") {
    summary
    val store = new SnapshotStore(storeRoot)
    val cur = store.currentSnapshot.get
    val debris = java.nio.file.Paths.get(store.snapshotDir(cur), ".reloc_output_spans")
    Files.createDirectories(debris)
    try {
      import spark.implicits._
      val ex = intercept[IllegalArgumentException] {
        CrawlJob.run(spark, seeds.toDS(), robots, hostMap.toDS(), universe,
          cfg.copy(maxRounds = 1), storeRoot)
      }
      assert(ex.getMessage.contains(".reloc_output_spans"))
    } finally Files.delete(debris)
  }

  test("rollback_to_snapshot: resume replays deterministically from the rolled-back checkpoint") {
    val root = Files.createTempDirectory("crawl-rollback").toString
    import spark.implicits._
    CrawlJob.run(spark, seeds.toDS(), robots, hostMap.toDS(), universe, cfg, root)
    val store = new SnapshotStore(root)
    def seenMap(id: Int) = store.readSeen(spark, id)
      .select("url_canon", "round_first_seen")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val seenBefore = seenMap(2)
    store.rollbackTo(1)
    assert(store.currentSnapshot === Some(1))
    // the rolled-over snapshot is gone (its id will be recommitted)
    assert(!Files.exists(java.nio.file.Paths.get(store.snapshotDir(2))))
    assert(seenMap(1) === model.rounds.take(2)
      .flatMap(_.admittedOrdered).distinct
      .map(u => u -> model.seen(u)).toMap)
    // resume ONE round from the rolled-back checkpoint: round 2 is
    // recomputed, and determinism makes it bit-equal to the first run
    CrawlJob.run(spark, seeds.toDS(), robots, hostMap.toDS(), universe,
      cfg.copy(maxRounds = 1), root)
    assert(store.currentSnapshot === Some(2))
    assert(seenMap(2) === seenBefore)
    assert(seenMap(2) === model.seen)
  }

  test("hot-host politeness budget is honored per round") {
    summary
    val store = new SnapshotStore(storeRoot)
    (0 until math.min(cfg.maxRounds, store.currentSnapshot.get + 1)).foreach { r =>
      if (store.hasTable(r, "frontier")) {
        val perHost = store.read(spark, r, "frontier")
          .groupBy("host").count().collect()
        perHost.foreach { row =>
          assert(row.getLong(1) <= cfg.hostBudgetPerRound,
            s"round $r host ${row.getString(0)} over budget")
        }
      }
    }
  }

  test("WAP-gated rounds produce the same crawl as plain commits; no staged leftovers") {
    import spark.implicits._
    summary // baseline run (plain commits) forced
    val wapRoot = Files.createTempDirectory("crawl-wap").toString
    val wapSummary = CrawlJob.run(spark, seeds.toDS(), robots, hostMap.toDS(),
      universe, cfg.copy(wapAudit = true), wapRoot)
    assert(wapSummary.rounds.map(r => (r.round, r.admitted, r.fetched, r.seenTotal)) ===
      summary.rounds.map(r => (r.round, r.admitted, r.fetched, r.seenTotal)))
    // fixed expectations, not the shared baseline store — the resume
    // test extends storeRoot past cfg.maxRounds when the suite runs in
    // full, so its CURRENT is order-dependent
    val store = new SnapshotStore(wapRoot)
    assert(store.currentSnapshot === Some(cfg.maxRounds - 1))
    assert(store.committedSnapshots === (0 until cfg.maxRounds))
    assert(store.committedSnapshots.forall(id => !store.isStaged(id)),
      "every published round must have dropped the staged flag")
    val last = store.currentSnapshot.get
    val wapSeen = store.readSeen(spark, last)
      .select("url_canon", "round_first_seen")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(wapSeen === model.seen)
    // the audit gate actually bites: a staged snapshot whose delta is
    // tampered with must be abandoned, not published
    val store2root = Files.createTempDirectory("crawl-wap-tamper").toString
    val store2 = new SnapshotStore(store2root)
    store2.write(Seq(("https://t/0", 1L, 0)).toDF("url_canon", "url_hash", "round_first_seen"),
      0, "url_seen_delta")
    store2.commit(0, 0)
    store2.write(Seq((null.asInstanceOf[String], 2L, 1))
      .toDF("url_canon", "url_hash", "round_first_seen"), 1, "url_seen_delta")
    store2.stage(1, 1)
    val badRows = store2.read(spark, 1, "url_seen_delta")
      .filter(col("url_canon").isNull).count()
    assert(badRows === 1L)
    store2.abandon(1)
    assert(store2.currentSnapshot === Some(0))
  }
}
