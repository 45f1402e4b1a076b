package graft

import graft.model.CrawlConfig
import graft.operators.RouteOps
import graft.pipeline.CrawlJob
import graft.sources.{SnapshotStore, SyntheticWeb}
import graft.testkit.ReferenceCrawl
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Per-row fetch deadline budget (api/api.go:511 soft+5s) and the
  * request context (cookies by domain/path, scoped headers) wired into
  * the fetch stage — engine vs the straight-line model.
  */
class DeadlineContextSpec extends SparkSpec {

  private val cookies = Seq(
    RouteOps.Cookie("sess", "v", "example.test"),
    RouteOps.Cookie("h3", "v", "host3.example.test"),
    RouteOps.Cookie("sec", "v", "example.test", secure = true))
  private val headers = Seq(
    RouteOps.ScopedHeader("x-all", "1", None),
    RouteOps.ScopedHeader("x-even", "1", Some("""/page/\d*[02468]$""")))

  private val universe = SyntheticWeb.Universe(numHosts = 11, pagesPerHost = 30,
    seed = 3L, outlinksPerDoc = 3, cookies = cookies, scopedHeaders = headers)
  // tiny soft timeout → hard = 1005 ms → every page over ~1 s times out
  private val cfg = CrawlConfig(numPartitions = 4, saltsPerHost = 2,
    hostBudgetPerRound = 8, maxRounds = 2, softTimeoutMs = 1000L,
    bloomExpectedItems = 1 << 12)
  private val robots = SyntheticWeb.defaultRobots
  private val hostMap = SyntheticWeb.hostMap(universe.numHosts)
  private val seeds = universe.seedUrls(80)

  lazy val storeRoot: String = Files.createTempDirectory("deadline-spec").toString
  lazy val summary: CrawlJob.CrawlSummary = {
    import spark.implicits._
    CrawlJob.run(spark, seeds.toDS(), robots, hostMap.toDS(), universe, cfg, storeRoot)
  }
  lazy val model: ReferenceCrawl.Result =
    ReferenceCrawl.run(seeds, robots, hostMap.map(h => h.host -> h.ips).toMap, universe, cfg)

  test("rows over the hard deadline route to the error channel; outlinks not followed") {
    summary
    val store = new SnapshotStore(storeRoot)
    val log = store.readDeltas(spark, store.currentSnapshot.get, "fetch_log")
      .select("url_canon", "error", "duration_ms", "status").collect()
    val hard = cfg.softTimeoutMs + 5000L
    val deadline = log.filter(_.getString(1).startsWith("deadline:"))
    assert(deadline.nonEmpty, "the tiny budget must trip on the slow tail")
    // exactly the over-budget successful fetches are deadline-classified
    // (3xx is a successful response too: a slow redirect trips the same
    // budget and its Location hop is not followed)
    log.foreach { r =>
      val ok = r.getInt(3) == 200 || r.getInt(3) == 301 || r.getInt(3) == 302
      val isDeadline = r.getString(1).startsWith("deadline:")
      val shouldBe = ok && r.getLong(2) > hard
      assert(isDeadline === shouldBe, s"${r.getString(0)}: ${r.getString(1)} dur=${r.getLong(2)}")
    }
    // timed-out URLs are still SEEN (they were admitted) — model parity
    val engineSeen = store.readSeen(spark, store.currentSnapshot.get)
      .select("url_canon", "round_first_seen")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(engineSeen === model.seen)
  }

  test("output spans match the model under the deadline budget (timed-out docs absent)") {
    summary
    val store = new SnapshotStore(storeRoot)
    model.rounds.foreach { rt =>
      val engineIds = store.read(spark, rt.round, "output_spans")
        .select("doc_id").collect().map(_.getString(0)).toSet
      assert(engineIds === rt.fetchedDocs.keySet, s"round ${rt.round}")
    }
  }

  test("cookies and scoped headers apply per request URL in the fetch log") {
    summary
    val store = new SnapshotStore(storeRoot)
    val log = store.readDeltas(spark, store.currentSnapshot.get, "fetch_log")
      .filter(col("status") === 200)
      .select("url_canon", "cookies_applied", "headers_applied").collect()
    assert(log.nonEmpty)
    log.foreach { r =>
      val url = r.getString(0)
      assert(r.getInt(1) === RouteOps.cookiesFor(url, cookies).size, url)
      assert(r.getInt(2) === RouteOps.headersFor(url, headers).size, url)
    }
    // the fixtures actually discriminate: h3 cookie only on host3, x-even
    // only on even pages, sec everywhere (all URLs are https)
    val counts = log.map(_.getInt(1)).toSet
    assert(counts.contains(2) && counts.contains(3), s"cookie fixture saturated: $counts")
    assert(log.map(_.getInt(2)).toSet === Set(1, 2))
  }
}
