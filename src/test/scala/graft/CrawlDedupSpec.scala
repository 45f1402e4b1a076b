package graft

import java.nio.file.Files

import graft.datatools.Dedup
import graft.model.CrawlConfig
import graft.pipeline.CrawlJob
import graft.sources.{SnapshotStore, SyntheticWeb}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The crawl × datatools interleave: with `dedupDocs` on, every round
  * dedups its converted docs against the ACCUMULATED minhash_index
  * delta table (prior signatures read, never recomputed) and appends
  * its own index rows. The invariant pinned here: the union of the
  * per-round incremental doc_dup_pairs equals one batch LSH run over
  * ALL crawled docs — incremental processing loses nothing and invents
  * nothing, round over round.
  *
  * k = 1 (unigram shingles) + threshold 0.5 so the synthetic web's
  * templated short texts actually produce near-dup pairs to find.
  */
class CrawlDedupSpec extends SparkSpec {

  private val universe = SyntheticWeb.Universe(numHosts = 11, pagesPerHost = 25,
    seed = 13L, outlinksPerDoc = 3, spansPerDoc = 4)
  private val cfg = CrawlConfig(numPartitions = 8, saltsPerHost = 2,
    hostBudgetPerRound = 4, maxRounds = 3, bloomExpectedItems = 1 << 12,
    dedupDocs = true, dedupThreshold = 0.5, dedupShingleK = 1)

  private lazy val storeRoot: String = Files.createTempDirectory("crawl-dedup").toString
  private lazy val summary: CrawlJob.CrawlSummary = {
    import spark.implicits._
    CrawlJob.run(spark, universe.seedUrls(40).toDS(), SyntheticWeb.defaultRobots,
      SyntheticWeb.hostMap(universe.numHosts).toDS(), universe, cfg, storeRoot)
  }

  private def docText(df: DataFrame): DataFrame = df.select(col("doc_id"),
    expr("array_join(transform(spans, s -> s.text), ' ')").as("text"))

  private def pairSet(df: DataFrame): Set[(String, String, Double)] =
    df.select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet

  test("union of per-round incremental doc_dup_pairs == batch LSH over all docs") {
    summary
    val store = new SnapshotStore(storeRoot)
    val last = store.currentSnapshot.get
    val incremental = pairSet(store.readDeltas(spark, last, "doc_dup_pairs"))
    val allDocs = docText(store.readDeltas(spark, last, "output_spans"))
    val batch = pairSet(Dedup.minhashLshPairs(allDocs, k = cfg.dedupShingleK,
      threshold = cfg.dedupThreshold, seed = cfg.seed))
    assert(batch.nonEmpty, "fixture produced no near-dup pairs — weaken threshold")
    assert(incremental === batch)
    // and the pairs really span rounds (the incremental path exercised
    // index reads, not just in-round delta×delta)
    val firstSeen = store.readSeen(spark, last)
      .select("url_canon", "round_first_seen").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(incremental.exists { case (a, b, _) => firstSeen(a) != firstSeen(b) },
      "no cross-round pair found — fixture too small to exercise the index path")
  }

  test("minhash_index accumulates exactly the shingle-bearing docs; manifest pins k") {
    summary
    val store = new SnapshotStore(storeRoot)
    val last = store.currentSnapshot.get
    val index = store.readDeltas(spark, last, "minhash_index")
    // `round` makes the index compactable (hidden-partitionable by
    // round) under CrawlConfig.compactEvery maintenance, and each
    // delta's rows carry the round that appended them
    assert(index.columns.toSeq === Seq("id", "sz", "sig", "round"))
    assert(index.select("round").distinct().count() === last + 1,
      "each committed round appended its own index delta")
    val allDocs = docText(store.readDeltas(spark, last, "output_spans"))
    // the canonical tokenizer's own emptiness predicate (at k = 1 even
    // an empty text yields one empty-token shingle — the twin-pinned
    // semantics, so two empty docs are exact dups with jaccard 1.0):
    // the assertion is about delta ACCUMULATION, one index row per
    // crawled doc across all three snapshots, not tokenizer edge cases
    val expected = allDocs.filter(
      size(graft.functions.MinHashExprs.shinglesCol(col("text"), cfg.dedupShingleK)) > 0).count()
    assert(index.count() === expected)
    assert(index.count() === allDocs.count(), "at k=1 every doc is indexed")
    assert(index.select("id").distinct().count() === index.count(), "one row per doc")
    assert(store.manifestMeta(last).get("dedup_k") === Some("1"))
    assert(store.manifestMeta(last).get("dedup_threshold") === Some("0.5"))
  }

  test("resume pins dedup_k AND dedup_threshold from the manifest (checkpoint wins over cfg)") {
    summary
    import spark.implicits._
    // resume one round with a mismatched cfg: a different k would band
    // fresh signatures against incomparable stored ones, a different
    // threshold would break the union==batch invariant above
    CrawlJob.run(spark, universe.seedUrls(40).toDS(), SyntheticWeb.defaultRobots,
      SyntheticWeb.hostMap(universe.numHosts).toDS(), universe,
      cfg.copy(maxRounds = 1, dedupShingleK = 5, dedupThreshold = 0.99), storeRoot)
    val store = new SnapshotStore(storeRoot)
    val last = store.currentSnapshot.get
    assert(store.manifestMeta(last).get("dedup_k") === Some("1"))
    assert(store.manifestMeta(last).get("dedup_threshold") === Some("0.5"))
    // the invariant still holds across the resumed round at the PINNED
    // parameters — proof the mismatched cfg never reached the operator
    val incremental = pairSet(store.readDeltas(spark, last, "doc_dup_pairs"))
    val allDocs = docText(store.readDeltas(spark, last, "output_spans"))
    val batch = pairSet(Dedup.minhashLshPairs(allDocs, k = 1,
      threshold = 0.5, seed = cfg.seed))
    assert(incremental === batch)
  }
}
