package graft

import graft.model.CrawlConfig
import graft.pipeline.{CrawlJob, Health}
import graft.sources.SyntheticWeb
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** S10: health/version/debug surfaces over engine state. */
class HealthSpec extends SparkSpec {

  test("health: all checks up over a committed crawl store; aggregate row agrees") {
    import spark.implicits._
    val universe = SyntheticWeb.Universe(numHosts = 5, pagesPerHost = 10, seed = 1L)
    val cfg = CrawlConfig(numPartitions = 2, saltsPerHost = 1,
      hostBudgetPerRound = 4, maxRounds = 1, bloomExpectedItems = 1 << 10)
    val root = Files.createTempDirectory("health-spec").toString
    CrawlJob.run(spark, universe.seedUrls(20).toDS(), SyntheticWeb.defaultRobots,
      SyntheticWeb.hostMap(universe.numHosts).toDS(), universe, cfg, root)
    val rows = Health.health(spark, Some(root)).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("snapshot-store") === "up")
    assert(rows("url-seen") === "up")
    assert(rows("seen-sketches") === "up", "bloom+cuckoo must persist per round")
    assert(rows("engines") === "up" && rows("spark") === "up")
    assert(rows("*") === "up")
  }

  test("health: missing store turns the aggregate down (one failing check suffices)") {
    val rows = Health.health(spark, Some("/nonexistent/store")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("snapshot-store") === "down")
    assert(rows("*") === "down")
  }

  test("version and debug expose engine metadata; module list is AlphanumericSort-ordered") {
    val v = Health.version(spark).collect()(0)
    assert(v.getString(0).startsWith("graft") && v.getString(1) === spark.version)
    val dbg = Health.debug(spark, CrawlConfig()).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dbg("version") === Health.EngineVersion)
    val mods = dbg("modules").split(",").toSeq
    assert(mods === graft.functions.AlphaSort.sorted(mods))
    assert(mods.contains("crawl-frontier") && mods.contains("url-seen"))
    // the flag surface echoes the config (debug.go:51-54 VisitAll analog)
    assert(dbg("flag:cuckooBuckets") === "64")
    assert(dbg("flag:softTimeoutMs") === "30000")
    assert(dbg.keys.count(_.startsWith("flag:")) >= 10)
  }
}
