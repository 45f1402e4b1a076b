package graft

import graft.functions.UrlFunctions
import graft.model.{CrawlConfig, FrontierEntry, RobotsRule, SeedUrl}
import graft.pipeline.CrawlJob
import graft.sources.{SnapshotStore, SyntheticWeb}
import graft.testkit.ReferenceCrawl
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Redirect semantics: a 3xx response carries no content and exactly
  * one outlink — its Location target — which re-enters through the
  * FULL admission stack next round (canonicalize → robots/IP-class →
  * seen → politeness). This is the reference's per-hop re-validation
  * posture (`gotenberg/outbound.go:356-392`: the outbound round
  * tripper runs once per redirect hop, closing the redirect SSRF
  * bypass) made frontier-shaped; redirect cycles need no hop cap
  * because the seen set extinguishes any chain that revisits a URL.
  */
class RedirectSpec extends SparkSpec {

  private val universe = SyntheticWeb.Universe(numHosts = 23, pagesPerHost = 40,
    seed = 7L, outlinksPerDoc = 3, spansPerDoc = 5)
  private val hostMap = SyntheticWeb.hostMap(universe.numHosts)

  private def allUrls: Seq[String] =
    for { h <- 0 until universe.numHosts; p <- 0 until universe.pagesPerHost }
      yield universe.pageUrl(h, p)

  private def redirectUrls: Seq[String] =
    allUrls.filter { u =>
      val s = universe.statusOf(UrlFunctions.urlHash(u))
      s == 301 || s == 302
    }

  private def entry(u: String): FrontierEntry = {
    val uh = UrlFunctions.urlHash(u)
    val h = UrlFunctions.hostOf(u)
    FrontierEntry(u, u, uh, h, UrlFunctions.hostSalt(h, uh, 2), 1.0, 1L, 0)
  }

  test("universe: ~2% of pages redirect; a 3xx response is content-free with one Location outlink") {
    val redirects = redirectUrls
    assert(redirects.nonEmpty, "no redirects in the test universe")
    val frac = redirects.size.toDouble / allUrls.size
    assert(frac > 0.005 && frac < 0.05, s"redirect fraction $frac out of band")
    redirects.take(20).foreach { u =>
      val f = universe.fetch(entry(u))
      assert(f.status == 301 || f.status == 302)
      assert(f.error.isEmpty, "a redirect is a successful response, not an error")
      assert(f.redirects === 1)
      assert(f.outlinks === Seq(universe.redirectTargetOf(u)))
      assert(f.final_url === f.outlinks.head)
      assert(f.doc.spans.isEmpty && f.bytes === 0L)
      assert(f.duration_ms > 0L, "a redirect round trip still costs latency")
    }
  }

  test("crawl: redirect targets re-enter the frontier; engine == model; lineage records the hops") {
    import spark.implicits._
    val cfg = CrawlConfig(numPartitions = 8, saltsPerHost = 2,
      hostBudgetPerRound = 6, maxRounds = 3, bloomExpectedItems = 1 << 12)
    val robots = SyntheticWeb.defaultRobots
    // seed every redirecting URL plus regular seeds so the path is hot
    val seeds = universe.seedUrls(40) ++
      redirectUrls.take(10).zipWithIndex.map { case (u, i) => SeedUrl(u, 2.0, 1000L + i) }
    val root = Files.createTempDirectory("redirect-spec").toString
    val summary = CrawlJob.run(spark, seeds.toDS(), robots, hostMap.toDS(), universe, cfg, root)
    val model = ReferenceCrawl.run(seeds, robots,
      hostMap.map(h => h.host -> h.ips).toMap, universe, cfg)
    val store = new SnapshotStore(root)
    val last = store.currentSnapshot.get

    // 1. seen-set equality with redirects in play
    val engineSeen = store.readSeen(spark, last)
      .select("url_canon", "round_first_seen")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(engineSeen === model.seen)

    // 2. the path is exercised, and 3xx rows are content-free lineage
    val log = store.readDeltas(spark, last, "fetch_log")
    val redirRows = log.filter(col("status").isin(301, 302)).collect()
    assert(redirRows.nonEmpty, "no redirect was fetched — spec is vacuous")
    redirRows.foreach { r =>
      assert(r.getAs[String]("error") === "")
      assert(r.getAs[Int]("redirects") === 1)
      assert(r.getAs[String]("final_url").nonEmpty)
      assert(r.getAs[Long]("bytes") === 0L)
    }

    // 3. at least one Location target was admitted in a LATER round —
    //    the chain continued through the frontier
    val followed = redirRows.exists { r =>
      val t = UrlFunctions.canonicalizeUrl(r.getAs[String]("final_url"))
      engineSeen.get(t).exists(_ > r.getAs[Int]("round"))
    }
    assert(followed, "no redirect target was ever admitted in a later round")

    // 4. redirect rows never contribute output spans
    val redirUrls = redirRows.map(_.getAs[String]("url_canon")).toSet
    (0 to last).foreach { r =>
      val ids = store.read(spark, r, "output_spans").select("doc_id")
        .collect().map(_.getString(0)).toSet
      assert(ids.intersect(redirUrls).isEmpty, s"round $r has spans for a 3xx row")
    }

    // 5. per-partition lineage counts the redirects
    val redirectsTotal = (0 to last).map { r =>
      store.read(spark, r, "metrics").agg(sum("redirects_total")).head().getLong(0)
    }.sum
    assert(redirectsTotal === redirRows.length.toLong)
    summary.rounds // summary is materialized either way; silence unused warnings
  }

  test("a redirect hop to a denied URL is re-validated and never fetched (SSRF posture)") {
    import spark.implicits._
    // pick a redirect whose target is a different URL
    val u = redirectUrls.find(u => universe.redirectTargetOf(u) != u).get
    val target = universe.redirectTargetOf(u)
    val robots = SyntheticWeb.defaultRobots :+
      RobotsRule(java.util.regex.Pattern.quote(target) + "$", "deny",
        deny_private_ips = false, deny_public_ips = false)
    val cfg = CrawlConfig(numPartitions = 4, saltsPerHost = 1,
      hostBudgetPerRound = 4, maxRounds = 2, bloomExpectedItems = 1 << 10)
    val seeds = Seq(SeedUrl(u, 1.0, 0L))
    val root = Files.createTempDirectory("redirect-deny").toString
    val summary = CrawlJob.run(spark, seeds.toDS(), robots, hostMap.toDS(), universe, cfg, root)
    val model = ReferenceCrawl.run(seeds, robots,
      hostMap.map(h => h.host -> h.ips).toMap, universe, cfg)
    val store = new SnapshotStore(root)
    val engineSeen = store.readSeen(spark, store.currentSnapshot.get)
      .select("url_canon").collect().map(_.getString(0)).toSet
    assert(engineSeen === model.seen.keySet)
    assert(engineSeen.contains(UrlFunctions.canonicalizeUrl(u)))
    assert(!engineSeen.contains(UrlFunctions.canonicalizeUrl(target)),
      "the denied redirect target must never be admitted")
    // the hop was seen by robots and denied in round 1
    assert(summary.rounds.exists(r => r.round == 1 && r.robotsDenied >= 1))
  }

  test("a redirect to an already-seen URL is extinguished by the seen layer (cycle bound)") {
    import spark.implicits._
    val u = redirectUrls.find(u => universe.redirectTargetOf(u) != u).get
    val target = UrlFunctions.canonicalizeUrl(universe.redirectTargetOf(u))
    val cfg = CrawlConfig(numPartitions = 4, saltsPerHost = 1,
      hostBudgetPerRound = 8, maxRounds = 3, bloomExpectedItems = 1 << 10)
    // seed BOTH the redirect and its target: the target is seen in
    // round 0, so the hop discovered in round 0's fetch must be
    // dropped by the seen filter — no URL is ever fetched twice
    val seeds = Seq(SeedUrl(u, 1.0, 0L), SeedUrl(target, 1.0, 1L))
    val robots = SyntheticWeb.defaultRobots
    val root = Files.createTempDirectory("redirect-cycle").toString
    CrawlJob.run(spark, seeds.toDS(), robots, hostMap.toDS(), universe, cfg, root)
    val model = ReferenceCrawl.run(seeds, robots,
      hostMap.map(h => h.host -> h.ips).toMap, universe, cfg)
    val store = new SnapshotStore(root)
    val log = store.readDeltas(spark, store.currentSnapshot.get, "fetch_log")
      .select("url_canon").collect().map(_.getString(0))
    assert(log.count(_ == target) === 1, "the redirect target must be fetched exactly once")
    val engineSeen = store.readSeen(spark, store.currentSnapshot.get)
      .select("url_canon", "round_first_seen")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(engineSeen === model.seen)
    assert(engineSeen(target) === 0)
  }
}
