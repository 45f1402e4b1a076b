package graft

import graft.model.CrawlConfig
import graft.pipeline.CrawlJob
import graft.sources.{SnapshotStore, SyntheticWeb}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** SURVEY §7.4 determinism risk, tested head-on: the crawl result must
  * be a pure function of the data — identical under different
  * partition counts (the in-session proxy for different executor
  * counts: task scheduling can only permute partition execution, and
  * every per-partition decision here is keyed by (host, salt), never
  * by partition identity).
  */
class DeterminismSpec extends SparkSpec {

  private val universe = SyntheticWeb.Universe(numHosts = 31, pagesPerHost = 60,
    seed = 99L, outlinksPerDoc = 3)
  private val robots = SyntheticWeb.defaultRobots
  private val hostMap = SyntheticWeb.hostMap(universe.numHosts)

  private def crawl(numPartitions: Int): (Map[String, Int], Seq[String], Map[String, Seq[(String, String, String, Int)]]) = {
    import spark.implicits._
    val cfg = CrawlConfig(numPartitions = numPartitions, saltsPerHost = 3,
      hostBudgetPerRound = 5, maxRounds = 2, bloomExpectedItems = 1 << 12)
    val root = Files.createTempDirectory(s"det-$numPartitions").toString
    CrawlJob.run(spark, universe.seedUrls(80).toDS(), robots, hostMap.toDS(),
      universe, cfg, root)
    val store = new SnapshotStore(root)
    val last = store.currentSnapshot.get
    val seen = store.readSeen(spark, last)
      .collect().map(r => r.getAs[String]("url_canon") -> r.getAs[Int]("round_first_seen")).toMap
    val order = (0 to last).flatMap { r =>
      store.read(spark, r, "frontier")
        .orderBy(col("host_hash"), col("priority").desc, col("seq"), col("url_canon"))
        .select("url_canon").collect().map(_.getString(0)).toSeq
    }
    val docs = (0 to last).flatMap { r =>
      store.read(spark, r, "output_spans")
        .selectExpr("doc_id", "transform(spans, s -> struct(s.kind, s.text, s.media_ref, s.offset)) AS s")
        .collect().map(row => row.getString(0) ->
          row.getSeq[org.apache.spark.sql.Row](1)
            .map(x => (x.getString(0), x.getString(1), x.getString(2), x.getInt(3))))
    }.toMap
    (seen, order, docs)
  }

  test("seen set, frontier order and spans are invariant under partition count") {
    val (seen3, order3, docs3) = crawl(3)
    val (seen16, order16, docs16) = crawl(16)
    assert(seen3 === seen16)
    assert(order3 === order16)
    assert(docs3 === docs16)
    assert(seen3.nonEmpty && docs3.nonEmpty)
  }
}
