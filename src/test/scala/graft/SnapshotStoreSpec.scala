package graft

import graft.sources.SnapshotStore
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Iceberg-table semantics of the snapshot store beyond atomic commit
  * (which CrawlJobSpec's resume/time-travel tests cover): add-column
  * schema evolution on the delta-union read, and manifest-level file
  * pruning for round-range reads.
  */
class SnapshotStoreSpec extends SparkSpec {

  private def freshStore(): SnapshotStore =
    new SnapshotStore(Files.createTempDirectory("store-spec").toString)

  test("add-column schema evolution: old snapshots project null for new columns") {
    import spark.implicits._
    val store = freshStore()
    // v0 written before the `source` column existed
    store.write(Seq(("https://a/0", 10L, 0)).toDF("url_canon", "url_hash", "round_first_seen"),
      0, "url_seen_delta")
    store.commit(0, 0)
    // v1 adds `source`
    store.write(Seq(("https://a/1", 11L, 1, "sitemap"))
      .toDF("url_canon", "url_hash", "round_first_seen", "source"),
      1, "url_seen_delta")
    store.commit(1, 1)
    val seen = store.readSeen(spark, 1)
    assert(seen.columns.toSet === Set("url_canon", "url_hash", "round_first_seen", "source"))
    val rows = seen.select("url_canon", "source").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(rows("https://a/0") === None, "pre-evolution row must project null")
    assert(rows("https://a/1") === Some("sitemap"))
    // single-schema stores keep the one-scan fast path: all files from
    // both snapshots appear in one frame with the original schema
    val store2 = freshStore()
    (0 to 1).foreach { r =>
      store2.write(Seq((s"https://b/$r", r.toLong, r))
        .toDF("url_canon", "url_hash", "round_first_seen"), r, "url_seen_delta")
      store2.commit(r, r)
    }
    assert(store2.readSeen(spark, 1).count() === 2)
  }

  test("manifest-level pruning: a round-range read never opens out-of-range snapshot files") {
    import spark.implicits._
    val store = freshStore()
    (0 to 2).foreach { r =>
      store.write((0 until 5).map(i => (s"https://h/$r/$i", (r * 10 + i).toLong, r))
        .toDF("url_canon", "url_hash", "round_first_seen"), r, "url_seen_delta")
      store.commit(r, r)
    }
    val prunedDf = store.readSeen(spark, 2, rounds = Some((1, 1)))
    // the PLAN only contains v1 files — pruning happened at metadata
    // time, not as a row filter after reading all three snapshots
    val files = prunedDf.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("/v1/")), files.mkString("\n"))
    assert(prunedDf.select("round_first_seen").distinct().collect().map(_.getInt(0)).toSeq === Seq(1))
    assert(prunedDf.count() === 5)
    // unpruned read sees all rounds
    assert(store.readSeen(spark, 2).count() === 15)
    // range covering everything prunes nothing
    assert(store.readSeen(spark, 2, rounds = Some((0, 2))).count() === 15)
  }

  test("hidden partitioning: layout prunes by partition value, readers never see the column") {
    import spark.implicits._
    val store = freshStore()
    val log = (0 until 60).map { i =>
      (s"https://h/$i", 200 + (i % 3) * 100, i.toLong) // statuses 200/300/400
    }.toDF("url_canon", "status", "bytes")
    // layout by status CENTURY — a derived value, not a column readers see
    store.writeHiddenPartitioned(log, 0, "fetch_log_hp", "status_century",
      (col("status") / 100).cast("int") * 100)
    store.commit(0, 0)
    assert(store.partitionTransform(0, "fetch_log_hp") === Some("status_century"))
    // plain read: full rows, NO _part column (hidden = not schema)
    val all = store.read(spark, 0, "fetch_log_hp")
    assert(all.columns.toSet === Set("url_canon", "status", "bytes"))
    assert(all.count() === 60)
    // partition-value read: only the 2xx directory's files enter the plan
    val only200 = store.readPartitions(spark, 0, "fetch_log_hp", Seq("200"))
    assert(only200.columns.toSet === Set("url_canon", "status", "bytes"))
    assert(only200.count() === 20)
    assert(only200.select("status").distinct().collect().map(_.getInt(0)).toSeq === Seq(200))
    // pruning is a SCAN property: the partition predicate lands in
    // PartitionFilters (inputFiles reflects the pre-pruning index, so
    // it can't witness this)
    val planStr = only200.queryExecution.executedPlan.toString()
    assert(planStr.contains("PartitionFilters") && planStr.contains("_part"), planStr)
    // and the layout itself: the 2xx rows live alone in their directory
    assert(spark.read.parquet(s"${store.tablePath(0, "fetch_log_hp")}/_part=200")
      .count() === 20)
    // delta-union read across a hidden-partitioned and a plain snapshot
    store.write(Seq(("https://h/x", 500, 1L)).toDF("url_canon", "status", "bytes"),
      1, "fetch_log_hp")
    store.commit(1, 1)
    val union = store.readDeltas(spark, 1, "fetch_log_hp")
    assert(union.columns.toSet === Set("url_canon", "status", "bytes"))
    assert(union.count() === 61)
    // metadata files table walks into the partition directories
    val metaFiles = store.filesTable(spark).filter(col("table") === "fetch_log_hp")
      .collect().map(_.getString(2))
    assert(metaFiles.exists(_.contains("_part=")), metaFiles.mkString("\n"))
  }

  test("metadata tables: snapshots and files mirror the committed store") {
    import spark.implicits._
    val store = freshStore()
    (0 to 1).foreach { r =>
      store.write((0 until 3).map(i => (s"https://m/$r/$i", i.toLong, r))
        .toDF("url_canon", "url_hash", "round_first_seen"), r, "url_seen_delta")
      store.commit(r, r)
    }
    // a dangling uncommitted dir must NOT appear (crashed-round debris)
    store.write(Seq(("x", 1L, 9)).toDF("url_canon", "url_hash", "round_first_seen"),
      9, "url_seen_delta")
    val snaps = store.snapshotsTable(spark).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getBoolean(2), r.getSeq[String](3)))
    assert(snaps.map(_._1).toSeq.sorted === Seq(0, 1))
    assert(snaps.forall(_._4.contains("url_seen_delta")))
    assert(snaps.filter(_._3).map(_._1).toSeq === Seq(1), "only v1 is current")
    val files = store.filesTable(spark).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(files.map(_._1).distinct.sorted.toSeq === Seq(0, 1))
    assert(files.forall(f => f._2 === "url_seen_delta" && f._3.endsWith(".parquet") && f._4 > 0))
    // the files table is exactly what the pruned read plans over
    // (compare by filesystem path — inputFiles returns URIs)
    val plannedV1 = store.readSeen(spark, 1, rounds = Some((1, 1))).inputFiles
      .map(u => new java.net.URI(u).getPath).toSet
    val metaV1 = files.filter(_._1 == 1).map(_._3).toSet
    assert(plannedV1 === metaV1)
  }

  test("compaction + expiry: same rows, fewer snapshots, pruning survives inside the base") {
    import spark.implicits._
    val store = freshStore()
    // 6 rounds of deltas, several files each (repartition(3)); rounds
    // 4-5 carry an ADDED column (src_tag) so the incremental second
    // compaction below mixes pre- and post-evolution files in one base
    (0 to 5).foreach { r =>
      val base = (0 until 10).map(i => (s"https://h/$r/$i", (r * 100 + i).toLong, r))
        .toDF("url_canon", "url_hash", "round_first_seen")
      val delta = if (r >= 4) base.withColumn("src_tag", lit(s"crawl$r")) else base
      store.write(delta.repartition(3), r, "url_seen_delta")
      store.commit(r, r)
    }
    val before = store.readSeen(spark, 5).collect().map(_.getString(0)).toSet
    val filesBefore = store.filesTable(spark)
      .filter(col("snapshot_id") <= 3 && col("table") === "url_seen_delta").count()

    // compact rounds 0..3 into v3; v0..v2 become expirable
    store.compactDeltas(spark, baseId = 3, table = "url_seen_delta")
    assert(store.compactedTables(3) === Set("url_seen_delta"))
    // rollback across a maintenance base would delete the only copy of
    // the rounds folded into it — refused
    val rbEx = intercept[IllegalArgumentException](store.rollbackTo(1))
    assert(rbEx.getMessage.contains("maintenance base"))
    // full read BEFORE expiry: identical row set (the base subsumes 0..2,
    // which must not be double-counted)
    assert(store.readSeen(spark, 5).collect().map(_.getString(0)).toSet === before)

    val expired = store.expireSnapshots()
    assert(expired === Seq(0, 1, 2))
    assert(store.committedSnapshots === Seq(3, 4, 5))
    // full read AFTER expiry: still the identical 60-row set
    val after = store.readSeen(spark, 5).collect().map(_.getString(0)).toSet
    assert(after === before)
    // fewer files for the compacted range: one partition dir per round
    // inside v3 instead of 4 snapshots x 3 files
    val filesAfter = store.filesTable(spark)
      .filter(col("snapshot_id") === 3 && col("table") === "url_seen_delta").count()
    assert(filesAfter < filesBefore, s"$filesAfter !< $filesBefore")

    // round-range pruning INSIDE the compacted base: only its matching
    // `_part=` dirs are planned, plus nothing from v4/v5
    val pruned = store.readSeen(spark, 5, rounds = Some((1, 2)))
    assert(pruned.collect().map(_.getString(0)).toSet ===
      before.filter(u => u.contains("/1/") || u.contains("/2/")))
    val planned = pruned.inputFiles
    assert(planned.nonEmpty && planned.forall(f =>
      f.contains("/v3/") && (f.contains("_part=1") || f.contains("_part=2"))),
      planned.mkString("\n"))
    // a range spanning base and later deltas unions both sides
    val spanning = store.readSeen(spark, 5, rounds = Some((3, 4)))
    assert(spanning.collect().map(_.getString(0)).toSet ===
      before.filter(u => u.contains("/3/") || u.contains("/4/")))
    // the seen read of the CURRENT snapshot feeds resume — unchanged
    assert(store.readSeen(spark, 5).count() === 60)

    // INCREMENTAL second pass: compacting into v5 rewrites only the
    // v4/v5 tail; v3's already-packed `_part=` dirs are carried by
    // RENAME — same file names, no rewrite — so per-pass maintenance
    // cost is O(delta since last pass), not O(table)
    val packedBefore = store.filesTable(spark)
      .filter(col("snapshot_id") === 3 && col("table") === "url_seen_delta")
      .collect().map(_.getString(2).split("/").last).toSet
    store.compactDeltas(spark, baseId = 5, table = "url_seen_delta")
    assert(store.expireSnapshots() === Seq(3, 4))
    assert(store.readSeen(spark, 5).collect().map(_.getString(0)).toSet === before)
    val carried = store.filesTable(spark)
      .filter(col("table") === "url_seen_delta")
      .collect().map(_.getString(2).split("/").last).toSet
    assert(packedBefore.subsetOf(carried), "prev-base partitions must carry by rename")
    assert(store.readSeen(spark, 5, rounds = Some((1, 2)))
      .collect().map(_.getString(0)).toSet ===
      before.filter(u => u.contains("/1/") || u.contains("/2/")))

    // ADD-COLUMN EVOLUTION ACROSS THE CARRY: v5 now mixes carried
    // pre-evolution files (rounds 0-3) with the rewritten post-
    // evolution tail (4-5) in one dir — footer merging must surface
    // src_tag, null for the old rounds, instead of letting one
    // arbitrary footer silently drop the column
    val evolved = store.readSeen(spark, 5)
    assert(evolved.columns.contains("src_tag"))
    assert(evolved.filter(col("round_first_seen") <= 3 && col("src_tag").isNotNull)
      .count() === 0)
    assert(evolved.filter(col("src_tag").isNotNull).count() === 20)
    assert(store.readSeen(spark, 5, rounds = Some((3, 4)))
      .filter(col("src_tag").isNotNull).count() === 10)

    // interrupted-maintenance debris blocks BOTH maintenance verbs
    val debris = java.nio.file.Paths.get(store.snapshotDir(5), ".maint_url_seen_delta")
    Files.writeString(debris, "url_seen_delta")
    try {
      val c = intercept[IllegalArgumentException](
        store.compactDeltas(spark, baseId = 5, table = "url_seen_delta"))
      assert(c.getMessage.contains("debris"))
      val r = intercept[IllegalArgumentException](
        store.relocateDeltas(baseId = 5, table = "url_seen_delta",
          roundCol = "round_first_seen"))
      assert(r.getMessage.contains("debris"))
    } finally Files.delete(debris)
  }

  test("relocation: rename-only fold preserves rows and file identity; chains across bases") {
    import spark.implicits._
    val store = freshStore()
    (0 to 3).foreach { r =>
      store.write((0 until 8).map(i => (s"d$r-$i", s"text $r $i", r))
        .toDF("doc_id", "text", "round").repartition(2), r, "output_spans")
      store.commit(r, r)
    }
    val before = store.readDeltas(spark, 3, "output_spans")
      .collect().map(_.getString(0)).toSet
    val filesBefore = store.filesTable(spark)
      .filter(col("table") === "output_spans")
      .collect().map(_.getString(2).split("/").last).toSet

    // fold 0..2 into v2 by pure rename — the DATA FILES are the same
    // files (no rewrite), just living under `_part=<round>` dirs now
    store.relocateDeltas(baseId = 2, table = "output_spans")
    assert(store.compactedTables(2) === Set("output_spans"))
    val filesAfter = store.filesTable(spark)
      .filter(col("table") === "output_spans")
      .collect().map(_.getString(2).split("/").last).toSet
    assert(filesAfter === filesBefore, "relocation must move, never rewrite")
    assert(store.readDeltas(spark, 3, "output_spans")
      .collect().map(_.getString(0)).toSet === before)
    // sources drained: the union starts at the base, expiry drops them
    assert(!store.hasTable(0, "output_spans") && !store.hasTable(1, "output_spans"))
    assert(store.expireSnapshots() === Seq(0, 1))

    // round-range pruning inside the relocated base, like compaction
    val pruned = store.readDeltas(spark, 3, "output_spans", rounds = Some((1, 1)))
    assert(pruned.collect().map(_.getString(0)).toSet === before.filter(_.startsWith("d1-")))
    assert(pruned.inputFiles.forall(f => f.contains("/v2/") && f.contains("_part=1")))

    // a LATER relocation folds the partitioned v2 base + plain v3 into
    // v3 — the chained-maintenance shape of a long crawl
    store.relocateDeltas(baseId = 3, table = "output_spans")
    assert(store.expireSnapshots() === Seq(2))
    assert(store.committedSnapshots === Seq(3))
    assert(store.readDeltas(spark, 3, "output_spans")
      .collect().map(_.getString(0)).toSet === before)
    assert(store.readDeltas(spark, 3, "output_spans", rounds = Some((0, 1)))
      .collect().map(_.getString(0)).toSet ===
      before.filter(d => d.startsWith("d0-") || d.startsWith("d1-")))
  }

  test("WAP: staged snapshot is invisible until publish; audit reads see it by id") {
    import spark.implicits._
    val store = freshStore()
    store.write(Seq(("https://a/0", 10L, 0)).toDF("url_canon", "url_hash", "round_first_seen"),
      0, "url_seen_delta")
    store.commit(0, 0)
    // stage v1 — fully written, manifest present, CURRENT untouched
    store.write(Seq(("https://a/1", 11L, 1)).toDF("url_canon", "url_hash", "round_first_seen"),
      1, "url_seen_delta")
    store.stage(1, 1, Map("audit" -> "pending"))
    assert(store.isStaged(1))
    assert(store.currentSnapshot === Some(0), "CURRENT must not move on stage")
    assert(store.committedSnapshots === Seq(0), "committed view excludes staged")
    assert(store.snapshotsTable(spark).count() === 1)
    // the union read is bounded by the committed view even when asked
    // past the staged id
    assert(store.readSeen(spark, 1).count() === 1)
    // the AUDITOR reads the staged snapshot explicitly
    val audit = store.read(spark, 1, "url_seen_delta")
    assert(audit.count() === 1)
    assert(audit.select("url_canon").head().getString(0) === "https://a/1")
    // publish: flag drops, CURRENT advances, rows join the union read
    store.publish(1)
    assert(!store.isStaged(1))
    assert(store.currentSnapshot === Some(1))
    assert(store.committedSnapshots === Seq(0, 1))
    assert(store.readSeen(spark, 1).count() === 2)
    assert(store.manifestMeta(1).get("audit") === Some("pending"),
      "publish keeps the staged manifest's other meta")
  }

  test("WAP: abandon deletes only staged snapshots; crash-before-publish leaves readers intact") {
    import spark.implicits._
    val store = freshStore()
    store.write(Seq(("https://b/0", 20L, 0)).toDF("url_canon", "url_hash", "round_first_seen"),
      0, "url_seen_delta")
    store.commit(0, 0)
    store.write(Seq(("https://b/1", 21L, 1)).toDF("url_canon", "url_hash", "round_first_seen"),
      1, "url_seen_delta")
    store.stage(1, 1)
    // crash model: nothing published — a fresh store handle (resume)
    // still serves the old snapshot and sees the staged one as staged
    val resumed = new SnapshotStore(store.root)
    assert(resumed.currentSnapshot === Some(0))
    assert(resumed.isStaged(1))
    assert(resumed.readSeen(spark, 1).count() === 1)
    // failed audit: abandon removes the dir; committed history refuses
    resumed.abandon(1)
    assert(!Files.exists(java.nio.file.Paths.get(resumed.snapshotDir(1))))
    intercept[IllegalArgumentException] { resumed.abandon(0) }
    assert(resumed.readSeen(spark, 0).count() === 1)
    // the id is reusable: stage again, publish this time
    resumed.write(Seq(("https://b/1b", 22L, 1)).toDF("url_canon", "url_hash", "round_first_seen"),
      1, "url_seen_delta")
    resumed.stage(1, 1)
    resumed.publish(1)
    assert(resumed.currentSnapshot === Some(1))
    assert(resumed.readSeen(spark, 1).count() === 2)
  }
}
