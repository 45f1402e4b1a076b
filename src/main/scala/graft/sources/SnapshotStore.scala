package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Snapshot/checkpoint store — Iceberg-style table semantics over plain
  * parquet (this sandbox ships no Iceberg runtime jars; the layout below
  * is a faithful miniature of Iceberg's snapshot model and swaps for
  * `writeTo(...).append()` + snapshot-id reads on a real cluster).
  *
  * Layout:
  * {{{
  *   <root>/v<N>/<table>/           parquet data per snapshot
  *   <root>/v<N>/MANIFEST.json      tables + row counts + round
  *   <root>/CURRENT                 text file: committed snapshot id
  * }}}
  *
  * Commit protocol: write everything under `v<N>` (invisible to readers),
  * then atomically move `CURRENT.tmp` → `CURRENT`. A crashed round leaves
  * a dangling `v<N>` that the next run ignores — exactly Iceberg's
  * snapshot atomicity, which is what makes the crawl resumable from the
  * last committed round (north rule: resumable from checkpoint with
  * per-partition lineage).
  */
final class SnapshotStore(val root: String) {

  private def rootPath: Path = Paths.get(root)
  private def currentFile: Path = rootPath.resolve("CURRENT")

  def currentSnapshot: Option[Int] =
    if (Files.exists(currentFile)) Some(Files.readString(currentFile).trim.toInt) else None

  def snapshotDir(id: Int): String = s"$root/v$id"

  def tablePath(id: Int, table: String): String = s"${snapshotDir(id)}/$table"

  def hasTable(id: Int, table: String): Boolean =
    Files.exists(Paths.get(tablePath(id, table), "_SUCCESS"))

  /** Hidden-partition layout column — written as a partition directory,
    * NEVER visible to readers (Iceberg's hidden partitioning: layout is
    * table metadata, not schema).
    */
  private val HiddenPartCol = "_part"
  private def transformMarker(id: Int, table: String): Path =
    Paths.get(tablePath(id, table), "_PARTITION_TRANSFORM")

  def read(spark: SparkSession, id: Int, table: String): DataFrame = {
    // a maintained base can hold files of MIXED schemas in one dir (the
    // incremental carry renames pre-evolution partitions in beside the
    // rewritten tail); without footer merging a single arbitrary footer
    // would win and silently drop an added column. Plain per-round
    // deltas stay on the cheap single-footer path.
    val reader =
      if (partitionTransform(id, table).isDefined)
        spark.read.option("mergeSchema", "true")
      else spark.read
    val df = reader.parquet(tablePath(id, table))
    if (df.columns.contains(HiddenPartCol)) df.drop(HiddenPartCol) else df
  }

  def readOrEmpty(spark: SparkSession, id: Option[Int], table: String, like: DataFrame): DataFrame =
    id.filter(hasTable(_, table)) match {
      case Some(s) => spark.read.parquet(tablePath(s, table))
      case None => like.limit(0)
    }

  /** Clear a dangling (uncommitted) snapshot dir before staging round
    * `id`: a crashed attempt — or a rolled-back timeline whose deletes
    * were interrupted — may have left tables the new attempt will not
    * overwrite, and `commit` manifests every dir it finds, so stale
    * tables from the dead attempt would be re-manifested as live data.
    * Refuses to touch committed snapshots.
    */
  def clearStaged(id: Int): Unit = {
    require(currentSnapshot.forall(_ < id), s"refusing to clear committed snapshot $id")
    deleteRecursively(Paths.get(snapshotDir(id)))
  }

  /** Stage a table into the (uncommitted) snapshot `id`. */
  def write(df: DataFrame, id: Int, table: String,
            sortWithinPartitionsBy: Seq[String] = Nil): Unit = {
    val out =
      if (sortWithinPartitionsBy.nonEmpty)
        df.sortWithinPartitions(sortWithinPartitionsBy.map(org.apache.spark.sql.functions.col): _*)
      else df
    out.write.mode(SaveMode.Overwrite).parquet(tablePath(id, table))
  }

  /** Stage a table with a HIDDEN partition: rows are laid out under
    * `_part=<value>` directories computed by `transform`, the transform
    * column never appears to readers (every read path drops it), and a
    * `_PARTITION_TRANSFORM` marker records the transform name — the
    * Iceberg hidden-partitioning contract (partitioning is table
    * metadata; predicates on partition VALUES prune files without the
    * schema ever carrying the derived column). Opt-in per table.
    */
  def writeHiddenPartitioned(df: DataFrame, id: Int, table: String,
                             transformName: String,
                             transform: org.apache.spark.sql.Column): Unit = {
    df.withColumn(HiddenPartCol, transform)
      .write.mode(SaveMode.Overwrite).partitionBy(HiddenPartCol)
      .parquet(tablePath(id, table))
    Files.writeString(transformMarker(id, table), transformName)
  }

  /** The recorded hidden-partition transform of a staged table. */
  def partitionTransform(id: Int, table: String): Option[String] =
    if (Files.exists(transformMarker(id, table)))
      Some(Files.readString(transformMarker(id, table)).trim)
    else None

  /** Read a hidden-partitioned table keeping only the given partition
    * VALUES — the predicate lands on the partition column inside the
    * scan (PartitionFilters), so out-of-range `_part=` directories
    * never enter the plan, and the returned frame still hides the
    * column.
    */
  def readPartitions(spark: SparkSession, id: Int, table: String,
                     values: Seq[String]): DataFrame = {
    // metadata-level pruning: only the matching `_part=<v>` dirs enter
    // the plan as read paths (basePath keeps the partition column
    // parsing) — out-of-range files are absent from the scan, not
    // filtered after it, exactly like Iceberg partition pruning
    val dirs = values.map(v => Paths.get(tablePath(id, table), s"$HiddenPartCol=$v"))
      .filter(Files.isDirectory(_)).map(_.toString)
    if (dirs.isEmpty) read(spark, id, table).limit(0)
    else spark.read.option("basePath", tablePath(id, table))
      // mixed schemas across carried partitions — see read()
      .option("mergeSchema", "true")
      .parquet(dirs: _*)
      .drop(HiddenPartCol)
  }

  /** Atomically commit snapshot `id` with manifest metadata. */
  /** Files.list/walk hold an open directory handle until closed — a
    * long-lived driver calling metadata paths repeatedly would leak fds
    * toward ulimit without the explicit close.
    */
  private def listed[A](dir: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(dir)
    try f(s.iterator().asScala) finally s.close()
  }
  private def walked[A](dir: Path)(f: Iterator[Path] => A): A = {
    val s = Files.walk(dir)
    try f(s.iterator().asScala) finally s.close()
  }

  /** Table dirs of a snapshot — dot-dirs (crashed compaction staging)
    * never reach a manifest.
    */
  private def listedTables(id: Int): Seq[String] =
    listed(Paths.get(snapshotDir(id)))(
      _.filter(Files.isDirectory(_)).map(_.getFileName.toString)
        .filterNot(_.startsWith(".")).toSeq).sorted

  private def writeManifestFile(id: Int, round: Int, meta: Map[String, String]): Unit = {
    Files.createDirectories(Paths.get(snapshotDir(id)))
    val tables = listedTables(id)
    val metaJson = (meta + ("round" -> round.toString))
      .map { case (k, v) => s""""$k": "$v"""" }.mkString(", ")
    val manifest =
      s"""{"snapshot_id": $id, "round": $round, "tables": [${tables.map(t => s""""$t"""").mkString(", ")}], "meta": {$metaJson}}"""
    Files.writeString(Paths.get(snapshotDir(id), "MANIFEST.json"), manifest)
  }

  private def advanceCurrent(id: Int): Unit = {
    val tmp = rootPath.resolve("CURRENT.tmp")
    Files.writeString(tmp, id.toString)
    Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def commit(id: Int, round: Int, meta: Map[String, String] = Map.empty): Unit = {
    writeManifestFile(id, round, meta)
    advanceCurrent(id)
  }

  // -------------------------------------------------------------------
  // Write–Audit–Publish (Iceberg WAP): stage a fully-written snapshot
  // behind a `staged` manifest flag WITHOUT advancing CURRENT. Every
  // committed-view code path — union reads, metadata tables, rollback,
  // expiry, [[committedSnapshots]] — ignores staged snapshots; only an
  // explicit `read(spark, id, table)` (the auditor) sees the data.
  // Validation queries run against the staged id, then either
  // [[publish]] (drop the flag + atomic CURRENT swap — the same two
  // steps as [[commit]]) or [[abandon]] (delete the dir). A crash
  // between stage and publish leaves CURRENT — and thus every reader —
  // on the old snapshot; resume re-audits and decides.
  // -------------------------------------------------------------------

  /** True iff `id` has a manifest carrying the staged flag. */
  def isStaged(id: Int): Boolean =
    Files.exists(Paths.get(snapshotDir(id), "MANIFEST.json")) &&
      manifestMeta(id).get("staged").contains("true")

  /** Describe snapshot `id` (already written via [[write]]) as STAGED:
    * manifest lands, CURRENT does not move.
    */
  def stage(id: Int, round: Int, meta: Map[String, String] = Map.empty): Unit =
    writeManifestFile(id, round, meta + ("staged" -> "true"))

  /** Promote a staged snapshot: rewrite its manifest without the flag,
    * then advance CURRENT atomically. After this the snapshot is
    * indistinguishable from one created by [[commit]].
    */
  def publish(id: Int): Unit = {
    require(isStaged(id), s"snapshot $id is not staged")
    writeManifestFile(id, snapshotRound(id), manifestMeta(id) - "staged" - "round")
    advanceCurrent(id)
  }

  /** Drop a staged snapshot that failed its audit. Refuses non-staged
    * ids — committed history is only removed via [[rollbackTo]] /
    * [[expireSnapshots]].
    */
  def abandon(id: Int): Unit = {
    require(isStaged(id), s"snapshot $id is not staged")
    deleteRecursively(Paths.get(snapshotDir(id)))
  }

  def readManifest(id: Int): String =
    Files.readString(Paths.get(snapshotDir(id), "MANIFEST.json"))

  /** The `meta` key/value pairs of a committed snapshot's manifest —
    * the checkpoint's self-describing parameters (sketch partitioning,
    * counters). Resume paths validate against these instead of trusting
    * the caller's config to still match the on-disk layout.
    */
  def manifestMeta(id: Int): Map[String, String] = {
    val manifest = readManifest(id)
    val metaBody = """"meta":\s*\{([^}]*)\}""".r
      .findFirstMatchIn(manifest).map(_.group(1)).getOrElse("")
    """"([^"]+)":\s*"([^"]*)"""".r.findAllMatchIn(metaBody)
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  /** Delta tables this snapshot was compacted over (it subsumes every
    * earlier snapshot's rows of those tables); empty when the snapshot
    * is a plain per-round delta.
    */
  def compactedTables(id: Int): Set[String] =
    if (!Files.exists(Paths.get(snapshotDir(id), "MANIFEST.json"))) Set.empty
    else manifestMeta(id).get("compacted_tables")
      .map(_.split(",").filter(_.nonEmpty).toSet).getOrElse(Set.empty)

  /** Rewrite snapshot `id`'s manifest in place with extra meta, WITHOUT
    * touching CURRENT — maintenance operations (compaction) re-describe
    * an already-committed snapshot; only `commit` moves the pointer.
    */
  private def rewriteManifest(id: Int, extraMeta: Map[String, String]): Unit = {
    val round = snapshotRound(id)
    val tables = listedTables(id)
    val meta = manifestMeta(id) ++ extraMeta + ("round" -> round.toString)
    val metaJson = meta.map { case (k, v) => s""""$k": "$v"""" }.mkString(", ")
    val manifest =
      s"""{"snapshot_id": $id, "round": $round, "tables": [${tables.map(t => s""""$t"""").mkString(", ")}], "meta": {$metaJson}}"""
    Files.writeString(Paths.get(snapshotDir(id), "MANIFEST.json"), manifest)
  }

  /** Iceberg `rewrite_data_files` + manifest rewrite for the delta
    * tables: fold every delta of `table` in snapshots 0..baseId into
    * `v<baseId>/<table>` itself, hidden-partitioned by `roundCol` so
    * round-range reads keep file-level pruning INSIDE the compacted
    * table (the per-snapshot manifest prune those rounds used to get).
    * After compaction, snapshots below `baseId` hold no live data for
    * `table` and [[expireSnapshots]] may delete them.
    *
    * At 10⁴ crawl rounds this is the maintenance pass that keeps the
    * union read O(#snapshots-since-compaction) instead of O(#rounds
    * ever), and replaces 10⁴ small per-round files with
    * one-file-per-round partitions of a single table.
    */
  def compactDeltas(spark: SparkSession, baseId: Int, table: String,
                    roundCol: String = "round_first_seen"): Unit = {
    // the base need not carry its own delta (a round can legitimately
    // append nothing — e.g. zero converted docs → an empty index
    // delta): compaction folds every EARLIER delta into the base
    // regardless, so expiry below the base never strands live rows
    val all = (0 to baseId).filter(hasTable(_, table))
    require(all.nonEmpty, s"no $table in snapshots 0..$baseId to compact")
    // INCREMENTAL: a previous maintenance base already holds rounds
    // 0..prev as packed `_part=` dirs — those fold into the new base by
    // pure RENAME below; only the uncompacted tail (rounds since the
    // last maintenance) pays the rewrite. Per-pass cost is O(delta
    // since last maintenance), not O(table) — on a 10⁴-round crawl the
    // difference between flat and quadratic total maintenance cost.
    // NOT re-run-safe after a crash: the Overwrite tail write would
    // clobber staging that may hold the only copy of already-carried
    // prev-base partitions, and a fresh swap would destroy the backup.
    // Fail fast instead — the dot-dirs preserve every byte for manual
    // repair. (relocateDeltas' assembly, by contrast, is merge-
    // idempotent and adopts its own staging.)
    val debris = maintenanceDebris(baseId).filter(_.endsWith(s"_$table"))
    require(debris.isEmpty,
      s"interrupted-maintenance debris for $table in v$baseId (${debris.mkString(", ")}): " +
        "repair manually before compacting — a re-run would clobber parked rows")
    val prevBase = all.filter(id =>
      compactedTables(id).contains(table) && partitionTransform(id, table).isDefined)
      .lastOption.filter(_ < baseId)
    val tailIds = prevBase.map(b => all.filter(_ > b)).getOrElse(all)
    val tmp = Paths.get(snapshotDir(baseId), s".compact_$table")
    if (tailIds.nonEmpty) {
      val tail = tailIds.map(read(spark, _, table))
        .reduce(_.unionByName(_, allowMissingColumns = true))
      require(tail.columns.contains(roundCol), s"$table lacks round column $roundCol")
      // one shuffle by round → each `_part=<round>` dir gets its rows
      // from few tasks (fat files), instead of every task spraying
      // every round. Staged beside, then swapped: the rewrite must not
      // destroy its inputs (v<baseId>'s own delta) before the new
      // files exist.
      tail.repartition(org.apache.spark.sql.functions.col(roundCol))
        .withColumn(HiddenPartCol, org.apache.spark.sql.functions.col(roundCol))
        .write.mode(SaveMode.Overwrite).partitionBy(HiddenPartCol)
        .parquet(tmp.toString)
    } else Files.createDirectories(tmp)
    // previous base's packed partitions ride in by rename, never rewrite
    prevBase.foreach { b =>
      val src = Paths.get(tablePath(b, table))
      listed(src)(_.filter(p =>
        p.getFileName.toString.startsWith(s"$HiddenPartCol=")).toSeq)
        .foreach(d => mergeMove(d, tmp.resolve(d.getFileName.toString)))
    }
    // intent file: spans the swap → manifest window, during which the
    // pass leaves no staging/backup debris but is not yet recorded —
    // without it, a crash there would pass the resume fail-fast and
    // readDeltas would double-count every carried round
    val intent = Paths.get(snapshotDir(baseId), s".maint_$table")
    Files.writeString(intent, table)
    swapStaged(baseId, table, tmp)
    Files.writeString(transformMarker(baseId, table), s"identity($roundCol)")
    rewriteManifest(baseId, Map(
      "compacted_tables" -> (compactedTables(baseId) + table).toSeq.sorted.mkString(","),
      "compacted_through" -> baseId.toString))
    prevBase.foreach(b => deleteRecursively(Paths.get(tablePath(b, table))))
    Files.delete(intent)
  }

  /** Swap a fully-staged maintenance layout in for the live table: the
    * old table moves aside with ONE rename (not a slow recursive delete
    * while the table is already gone), the staging dir renames in, and
    * `_SUCCESS` is (re)written so `hasTable` holds even when the staged
    * layout came from renames alone (empty-tail compaction / relocation
    * never ran a Spark write). The unreadable window is two renames
    * wide; the old layout survives intact in the `.old_` dir until the
    * swap completes.
    */
  private def swapStaged(baseId: Int, table: String, staged: Path): Unit = {
    val dst = Paths.get(tablePath(baseId, table))
    val bak = Paths.get(snapshotDir(baseId), s".old_$table")
    deleteRecursively(bak)
    if (Files.exists(dst)) Files.move(dst, bak)
    Files.move(staged, dst)
    Files.writeString(dst.resolve("_SUCCESS"), "")
    deleteRecursively(bak)
  }

  private def deleteRecursively(p: Path): Unit = if (Files.exists(p)) {
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder()).forEach(Files.delete(_))
    finally s.close()
  }

  private def hasPartDirs(dir: Path): Boolean =
    Files.isDirectory(dir) && listed(dir)(
      _.exists(_.getFileName.toString.startsWith(s"$HiddenPartCol=")))

  /** Dot-dirs a crashed maintenance pass may have left in a snapshot —
    * `.compact_*` / `.reloc_*` staging and `.old_*` swap backups. They
    * preserve every byte of an interrupted pass, but rows parked there
    * are invisible to readers, so resume paths must refuse to crawl
    * over them ([[graft.pipeline.CrawlJob]] fails fast; the real
    * Iceberg metadata swap is the component that makes maintenance
    * crash-atomic, and is the documented drop-in for this store).
    */
  def maintenanceDebris(id: Int): Seq[String] =
    if (!Files.isDirectory(Paths.get(snapshotDir(id)))) Nil
    else listed(Paths.get(snapshotDir(id)))(
      _.map(_.getFileName.toString)
        .filter(n => n.startsWith(".compact_") || n.startsWith(".reloc_") ||
          n.startsWith(".old_") || n.startsWith(".maint_")).toSeq).sorted

  /** Move every entry of `from` into `into` (created if absent) —
    * idempotent per-file renames, the primitive both maintenance folds
    * (compaction's prev-base carry and relocation) are built from.
    */
  private def mergeMove(from: Path, into: Path): Unit = {
    Files.createDirectories(into)
    listed(from)(_.toSeq).foreach { f =>
      Files.move(f, into.resolve(f.getFileName.toString),
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Rename-only sibling of [[compactDeltas]] for the HEAVY history
    * tables (output spans, fetch log, dup pairs, metrics): fold every
    * snapshot ≤ `baseId`'s delta of `table` into `v<baseId>/<table>` as
    * hidden `_part=<round>` partition directories by pure file MOVE —
    * zero data rewrite. The result is layout-identical to what
    * [[compactDeltas]] produces (`identity(roundCol)` hidden
    * partitioning, round-range reads prune `_part=` dirs), but costs
    * O(#files) renames instead of an O(table) Spark job — at 100 TB a
    * maintenance pass must not rewrite the corpus it maintains, which
    * is exactly Iceberg's `expire_snapshots` contract: expiry drops
    * unreferenced metadata, never live data files.
    *
    * Each delta's files keep their `roundCol` column; the partition dir
    * merely mirrors it (identity transform), so readers see the same
    * rows either way. Sources already hidden-partitioned (an earlier
    * relocation base) contribute their `_part=` dirs verbatim.
    *
    * Crash safety: every byte is always on disk — moves stage into a
    * dot-dir (invisible to manifests), the live table moves aside with
    * one rename during the swap ([[swapStaged]]) and is deleted only
    * after the staged layout is in place, and the manifest is rewritten
    * BEFORE drained source dirs are deleted (so readers never union a
    * drained source). A crash mid-pass can leave rows parked in the
    * dot-dirs until a re-run of the pass at the SAME base completes the
    * idempotent merge-moves; this miniature does not self-heal across a
    * crash followed by maintenance at a LATER base — that last gap is
    * what the real Iceberg metadata swap (the documented drop-in
    * replacement for this store) closes.
    */
  def relocateDeltas(baseId: Int, table: String, roundCol: String = "round"): Unit = {
    val sources = (0 to baseId).filter(hasTable(_, table))
    require(sources.nonEmpty, s"no $table in snapshots 0..$baseId to relocate")
    val dstRoot = Paths.get(tablePath(baseId, table))
    val staging = Paths.get(snapshotDir(baseId), s".reloc_$table")
    // assembly-phase staging is adopted (merge-idempotent renames), but
    // swap-phase debris (.old_ backup, .maint_ intent) means a crash
    // mid-swap — fail fast, a fresh swap would destroy the backup
    val swapDebris = maintenanceDebris(baseId)
      .filter(d => d == s".old_$table" || d == s".maint_$table")
    require(swapDebris.isEmpty,
      s"interrupted-maintenance swap debris for $table in v$baseId " +
        s"(${swapDebris.mkString(", ")}): repair manually before relocating")
    Files.createDirectories(staging)
    sources.foreach { id =>
      val src = Paths.get(tablePath(id, table))
      // detect partitioned layout by CONTENT, not only the marker — a
      // crash between a swap and its marker write leaves `_part=` dirs
      // without one, and treating them as a plain delta would misfile
      // every carried round under this snapshot's round
      if (partitionTransform(id, table).isDefined || hasPartDirs(src)) {
        // an earlier base: its `_part=` dirs carry many rounds already
        listed(src)(_.filter(p =>
          p.getFileName.toString.startsWith(s"$HiddenPartCol=")).toSeq)
          .foreach(d => mergeMove(d, staging.resolve(d.getFileName.toString)))
      } else {
        val part = staging.resolve(s"$HiddenPartCol=${snapshotRound(id)}")
        Files.createDirectories(part)
        listed(src)(_.filter { p =>
          val n = p.getFileName.toString
          Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".")
        }.toSeq).foreach(f =>
          Files.move(f, part.resolve(f.getFileName.toString),
            StandardCopyOption.REPLACE_EXISTING))
      }
    }
    // an all-empty delta (a round that appended zero rows) contributes
    // a fileless `_part=` dir — drop it so a pruned read over just that
    // round falls back to the schema-bearing empty-frame path instead
    // of failing parquet schema inference on a dir with no footers
    listed(staging)(_.filter(Files.isDirectory(_)).toSeq)
      .filter(d => listed(d)(_.isEmpty)).foreach(Files.delete(_))
    // swap the assembled layout in (rename-aside, see swapStaged), then
    // mark + manifest BEFORE dropping the drained sources: once the
    // base is recorded as compacted, readers start their union at it
    // and never touch the empty source dirs. The intent file spans the
    // swap → manifest window, which otherwise leaves no debris for the
    // resume fail-fast to catch.
    val intent = Paths.get(snapshotDir(baseId), s".maint_$table")
    Files.writeString(intent, table)
    swapStaged(baseId, table, staging)
    Files.writeString(transformMarker(baseId, table), s"identity($roundCol)")
    rewriteManifest(baseId, Map(
      "compacted_tables" -> (compactedTables(baseId) + table).toSeq.sorted.mkString(","),
      "compacted_through" -> baseId.toString))
    sources.filter(_ != baseId)
      .foreach(id => deleteRecursively(Paths.get(tablePath(id, table))))
    Files.delete(intent)
  }

  /** Iceberg `rollback_to_snapshot`: atomically point CURRENT back at
    * an older committed snapshot; the crawl's resume path then replays
    * deterministically from that checkpoint. One deliberate difference
    * from Iceberg (which keeps orphaned snapshots until expiry): the
    * rolled-over snapshots are deleted here, because this layout reuses
    * their ids on the next commit — a stale `v<id+1>` table the re-run
    * round doesn't overwrite must not be re-manifested as live data.
    */
  def rollbackTo(id: Int): Unit = {
    require(committedSnapshots.contains(id), s"snapshot $id is not committed")
    val later = committedSnapshots.filter(_ > id)
    // a LATER maintenance base holds the ONLY copy of earlier rounds'
    // folded tables (sources were drained/expired into it) — deleting
    // it would destroy rounds ≤ id too. Rolling back across a
    // maintenance base is impossible in this id-reusing layout; real
    // Iceberg can, because old snapshots pin their own files.
    val bases = later.filter(l => compactedTables(l).nonEmpty)
    require(bases.isEmpty,
      s"cannot roll back to $id across maintenance base(s) v${bases.mkString(", v")}: " +
        "they hold the only copy of earlier rounds' compacted/relocated tables")
    val tmp = rootPath.resolve("CURRENT.tmp")
    Files.writeString(tmp, id.toString)
    Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    later.foreach(l => deleteRecursively(Paths.get(snapshotDir(l))))
  }

  /** Iceberg `expire_snapshots`: delete every snapshot dir strictly
    * below the newest compacted base (their rows live on inside it).
    * No-op without a compaction; never touches the base, anything after
    * it, or CURRENT. Returns the expired ids.
    */
  def expireSnapshots(): Seq[Int] = {
    // bounded by CURRENT: a dangling future dir (crash between
    // rollback's CURRENT swap and its deletes) must not elect itself
    // base and expire live snapshots below it
    val ids = committedSnapshots.filter(id => currentSnapshot.forall(id <= _))
    val base = ids.filter(id => compactedTables(id).nonEmpty).lastOption
    base match {
      case None => Nil
      case Some(b) =>
        val expire = ids.filter(_ < b)
        expire.foreach(id => deleteRecursively(Paths.get(snapshotDir(id))))
        expire
    }
  }

  /** The committed round of snapshot `id` (manifest "round" field);
    * falls back to the snapshot id for staged-but-unmanifested dirs —
    * the crawl layout keeps them equal.
    */
  def snapshotRound(id: Int): Int =
    if (Files.exists(Paths.get(snapshotDir(id), "MANIFEST.json")))
      """"round":\s*(\d+)""".r.findFirstMatchIn(readManifest(id))
        .map(_.group(1).toInt).getOrElse(id)
    else id

  /** Union a per-round DELTA table across snapshots 0..upTo — the
    * Iceberg-append read path: each round writes only its new rows and
    * readers see the concatenation (one multi-path parquet scan, no
    * shuffle, no per-round rewrite).
    *
    * Two Iceberg table semantics ride this read:
    *   - MANIFEST-LEVEL PRUNING: `rounds = Some((lo, hi))` skips every
    *     snapshot whose manifest round falls outside the range BEFORE
    *     any file is opened — the metadata-only planning step Iceberg
    *     does with manifest value ranges. A `round` predicate pushed to
    *     the scan would still read every snapshot's footers; the prune
    *     removes the files from the plan entirely.
    *   - ADD-COLUMN SCHEMA EVOLUTION: snapshots written before a column
    *     existed project that column as null. When every snapshot still
    *     shares one schema (the common case) the read stays a single
    *     multi-path scan; mixed schemas fold with
    *     `unionByName(allowMissingColumns)` — the union of parallel
    *     per-snapshot scans, no shuffle.
    */
  def readDeltas(spark: SparkSession, upTo: Int, table: String,
                 rounds: Option[(Int, Int)] = None): DataFrame = {
    // staged (WAP) snapshots are invisible to the union read even when
    // their dirs sit inside the id range — only publish admits them
    val all = (0 to upTo).filter(id => hasTable(id, table) && !isStaged(id))
    // a compacted snapshot subsumes every earlier delta of this table:
    // start the union at the NEWEST such base ≤ upTo (expired v<i> dirs
    // below it have already dropped out of `all`)
    val base = all.filter(id => compactedTables(id).contains(table)).lastOption
    val ids = base.map(b => all.filter(_ >= b)).getOrElse(all)
    val pruned = rounds match {
      case None => ids
      case Some((lo, hi)) => ids.filter { id =>
        if (base.contains(id)) lo <= snapshotRound(id) // holds rounds 0..base
        else { val r = snapshotRound(id); r >= lo && r <= hi }
      }
    }
    require(pruned.nonEmpty, s"no $table deltas up to snapshot $upTo (rounds=$rounds)")
    val frames = pruned.map { id =>
      rounds match {
        // the compacted base holds MANY rounds, hidden-partitioned by
        // the round column — a range read prunes its `_part=` dirs like
        // Iceberg partition pruning, so expiry costs the prune nothing
        case Some((lo, hi)) if base.contains(id) =>
          readPartitions(spark, id, table,
            (math.max(lo, 0) to math.min(hi, snapshotRound(id))).map(_.toString))
        case _ => read(spark, id, table)
      }
    }
    val schemas = frames.map(_.schema).distinct
    // hidden-partitioned snapshots have per-path directory layouts that
    // a single multi-root scan would try to unify — route them through
    // the per-snapshot union like mixed schemas
    val anyHidden = pruned.exists(id => partitionTransform(id, table).isDefined)
    if (schemas.size == 1 && !anyHidden)
      spark.read.parquet(pruned.map(tablePath(_, table)): _*)
    else frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** The full URL-seen set as of snapshot `upTo`; `rounds` prunes to
    * the snapshots first seen inside the range (url_seen_delta rows of
    * snapshot N all carry round_first_seen = N).
    */
  def readSeen(spark: SparkSession, upTo: Int, rounds: Option[(Int, Int)] = None): DataFrame =
    readDeltas(spark, upTo, "url_seen_delta", rounds)

  /** Every COMMITTED snapshot id (manifest present), ascending —
    * dangling `v<N>` dirs from crashed rounds are excluded, matching
    * the reader's view.
    */
  def committedSnapshots: Seq[Int] =
    if (!Files.isDirectory(rootPath)) Nil
    else listed(rootPath)(_.map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.drop(1).forall(_.isDigit) => s.drop(1).toInt }
      .filter(id => Files.exists(Paths.get(snapshotDir(id), "MANIFEST.json")))
      .toSeq).sorted.filterNot(isStaged)

  /** Iceberg-style `snapshots` metadata table: one row per committed
    * snapshot — (snapshot_id, round, is_current, tables). Built from
    * manifests on the driver: metadata rows are O(#snapshots), never
    * data-sized.
    */
  def snapshotsTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val cur = currentSnapshot
    committedSnapshots.map { id =>
      val tables = """"tables":\s*\[([^\]]*)\]""".r.findFirstMatchIn(readManifest(id))
        .map(_.group(1)).toSeq
        .flatMap(""""([^"]+)"""".r.findAllMatchIn(_).map(_.group(1)))
      (id, snapshotRound(id), cur.contains(id), tables)
    }.toDF("snapshot_id", "round", "is_current", "tables")
  }

  /** Iceberg-style `files` metadata table: one row per data file of
    * every committed snapshot — (snapshot_id, table, file, size_bytes).
    * The planning input the round-range prune operates on.
    */
  def filesTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    committedSnapshots.flatMap { id =>
      val dir = Paths.get(snapshotDir(id))
      listed(dir)(_.filter(Files.isDirectory(_))
        .filterNot(_.getFileName.toString.startsWith(".")).toSeq).flatMap { t =>
        // walk (not list): hidden-partitioned tables nest their data
        // files under `_part=<value>/` directories
        walked(t)(_.filter(f => f.getFileName.toString.endsWith(".parquet"))
          .map(f => (id, t.getFileName.toString, f.toString, Files.size(f)))
          .toSeq)
      }
    }.toDF("snapshot_id", "table", "file", "size_bytes")
  }
}
