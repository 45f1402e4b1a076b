package graft

import java.nio.file.Files

import graft.datatools.Dedup
import graft.sources.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental MinHash near-dup: a new batch dedups against the
  * corpus's persisted signature index without recomputing corpus
  * signatures — the per-snapshot operation of a 100-TB pipeline.
  * Pins (1) equality with the full-LSH pair set restricted to
  * delta-involving pairs, (2) the SnapshotStore round-trip (index
  * written at v1, read back, appended at v2 for the next batch),
  * (3) the empty-delta degenerate case.
  */
class IncrementalDedupSpec extends SparkSpec {

  // 20 disjoint-vocabulary docs + 5 planted near-dup pairs (i, 100+i)
  // for i < 5 — only planted pairs share any bigram (DatatoolsSpec's
  // fixture shape)
  private lazy val docs: DataFrame = {
    import spark.implicits._
    val base = (0 until 20).map { i =>
      (i.toLong, (0 until 30).map(j => s"d${i}w$j").mkString(" "))
    }
    val dups = (0 until 5).map { i =>
      val toks = base(i)._2.split(" "); toks(15) = "CHANGED"
      (100L + i, toks.mkString(" "))
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  // delta covers all three pair placements: (0,100) both-in-delta,
  // (1,101) cross, (2,102)/(3,103)/(4,104) corpus-only (must NOT appear)
  private val deltaIds = Set(0L, 100L, 101L)
  private lazy val delta = docs.filter(col("doc_id").isin(deltaIds.toSeq: _*))
  private lazy val corpus = docs.filter(!col("doc_id").isin(deltaIds.toSeq: _*))

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("incremental = full-LSH pair set restricted to delta-involving pairs") {
    val full = Dedup.minhashLshPairs(docs, k = 2, threshold = 0.7)
    val expected = pairSet(full).filter { case (a, b) => deltaIds(a) || deltaIds(b) }
    assert(expected === Set((0L, 100L), (1L, 101L)), "fixture sanity")
    val index = Dedup.minhashIndex(corpus, k = 2)
    val inc = Dedup.minhashIncrementalPairs(delta, corpus, index, k = 2, threshold = 0.7)
    assert(pairSet(inc) === expected)
    // jaccard values match the full path's, row for row
    val fullJ = full.filter(col("id_a").isin(0L, 1L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val incJ = inc.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incJ === fullJ)
  }

  test("index round-trips through the SnapshotStore and extends batch-over-batch") {
    val store = new SnapshotStore(Files.createTempDirectory("inc-dedup").toString)
    val index = Dedup.minhashIndex(corpus, k = 2)
    store.write(index, 1, "minhash_index")
    store.commit(1, round = 1, Map("minhash_k" -> "2", "minhash_bands" -> "16",
      "minhash_rows_per_band" -> "4", "minhash_seed" -> "42"))
    val restored = store.read(spark, 1, "minhash_index")
    val inc = Dedup.minhashIncrementalPairs(delta, corpus, restored, k = 2, threshold = 0.7)
    assert(pairSet(inc) === Set((0L, 100L), (1L, 101L)))

    // batch 2: the processed delta joins the corpus; its index rows are
    // appended (no corpus recompute) — a fresh near-dup of corpus doc 3
    // and of delta doc 100 must both be found against the grown index
    import spark.implicits._
    val nextIndex = restored.unionByName(Dedup.minhashIndex(delta, k = 2))
    store.write(nextIndex, 2, "minhash_index")
    store.commit(2, round = 2)
    val corpus2 = corpus.unionByName(delta)
    val d3 = corpus2.filter(col("doc_id") === 3L).head.getString(1).split(" ")
    d3(7) = "SWAPPED"
    val d100 = corpus2.filter(col("doc_id") === 100L).head.getString(1).split(" ")
    d100(22) = "SWAPPED"
    val delta2 = Seq((200L, d3.mkString(" ")), (201L, d100.mkString(" ")))
      .toDF("doc_id", "text")
    val inc2 = Dedup.minhashIncrementalPairs(delta2, corpus2,
      store.read(spark, 2, "minhash_index"), k = 2, threshold = 0.7)
    val got = pairSet(inc2)
    assert(got.contains((3L, 200L)) && got.contains((100L, 201L)), s"got $got")
    // 201 is two edits from doc 0 — if reported, it must be via the
    // exact-verified threshold, never an unverified bucket collision
    assert(got.forall { case (a, b) => Set(3L, 100L, 0L, 200L, 201L).contains(a) || b >= 200L })
  }

  test("incremental simhash = full simhash pair set restricted to delta pairs (both radii)") {
    import spark.implicits._
    // simhash needs long docs for a small edit to stay within radius
    val base = (0 until 15).map { i =>
      (i.toLong, (0 until 200).map(j => s"s${i}t$j").mkString(" "))
    }
    val dups = (0 until 5).map { i =>
      val toks = base(i)._2.split(" "); toks(77) = "CHANGED"
      (100L + i, toks.mkString(" "))
    }
    val longDocs = (base ++ dups).toDF("doc_id", "text")
    val dIds = Set(0L, 100L, 101L)
    val d = longDocs.filter(col("doc_id").isin(dIds.toSeq: _*))
    val c = longDocs.filter(!col("doc_id").isin(dIds.toSeq: _*))
    for ((bands, bits, radius) <- Seq((4, 16, 0), (2, 32, 1))) {
      val full = Dedup.simhashPairs(longDocs, maxDist = 12,
        bands = bands, bitsPerBand = bits, probeRadius = radius)
      val expected = pairSet(full).filter { case (a, b) => dIds(a) || dIds(b) }
      val inc = Dedup.simhashIncrementalPairs(d, Dedup.simhashIndex(c),
        maxDist = 12, bands = bands, bitsPerBand = bits, probeRadius = radius)
      assert(pairSet(inc) === expected, s"config $bands x $bits r$radius")
      assert(expected.nonEmpty, s"fixture produced no delta pairs at $bands x $bits")
    }
  }

  test("empty delta yields an empty result with the pair schema") {
    val index = Dedup.minhashIndex(corpus, k = 2)
    val inc = Dedup.minhashIncrementalPairs(delta.limit(0), corpus, index,
      k = 2, threshold = 0.7)
    assert(inc.columns.toSeq === Seq("id_a", "id_b", "jaccard"))
    assert(inc.count() === 0L)
  }
}
