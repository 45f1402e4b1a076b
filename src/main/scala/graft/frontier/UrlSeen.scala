package graft.frontier

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** URL-seen dedup layer (north rule): broadcast bloom → partitioned
  * cuckoo filters → exact left-anti join. The reference has no seen set
  * (it is request-driven); this is the engine-side left-anti join of
  * SURVEY.md §2.5, with the false-positive discipline of §7.4: a sketch
  * "maybe-seen" is NEVER trusted to drop a URL — only the exact layer
  * drops. A sketch "no" IS trusted to pass a URL: the bloom has no false
  * negatives by construction, and the cuckoo layer degrades itself to
  * all-maybe the moment an insert fails ([[CuckooFilter.saturated]]), so
  * its "no" stays authoritative.
  *
  * Layering + maintenance at 10^10 URLs (everything is O(round delta);
  * nothing rebuilds from the seen union, and no sketch bytes cross the
  * driver except the bloom, which the north star mandates as a
  * broadcast):
  *   - the BLOOM is a driver-held running filter sized once for the
  *     crawl's expected total; each round only the round's NEW urls are
  *     inserted (a distributed delta-bloom OR-merge, or a direct insert
  *     of collected hashes when the delta is small) and the result is
  *     re-broadcast. It clears the vast majority of genuinely-new URLs
  *     without any shuffle.
  *   - the CUCKOO layer is a persisted (bucket, filter_bytes) table,
  *     partitioned by `pmod(url_hash, buckets)`. Per round it is updated
  *     by cogrouping ONLY the delta's hashes with the existing blobs —
  *     executor-side, O(delta) inserts. Lookups cogroup the bloom's
  *     maybe-seen residue with the blobs on the same bucket key, so each
  *     task deserializes exactly its bucket's filter once; blobs move
  *     executor→executor, never through the driver.
  *   - the EXACT seen table (per-round deltas, union-read) confirms the
  *     residue via left-anti join — only rows both sketches call "maybe"
  *     pay the join.
  */
object UrlSeen {

  /** Fixed sketch partitioning — independent of cluster size so the
    * filter contents are replay-stable. 64 buckets bound the lookup
    * cogroup's parallelism; a 1000-executor deployment would raise this
    * (it is a parameter everywhere below) to O(4×executors).
    */
  val CuckooBuckets = 64

  def cuckooBucket(urlHash: Long, buckets: Int = CuckooBuckets): Int =
    Math.floorMod(urlHash, buckets.toLong).toInt

  // ---------------------------------------------------------------------
  // Bloom layer — driver-held, incrementally maintained.
  // ---------------------------------------------------------------------

  /** Empty bloom sized for the crawl's expected TOTAL (merge-compatible
    * delta blooms must use the same parameters — see [[bloomOfDelta]]).
    */
  def emptyBloom(expectedItems: Long, fpp: Double): BloomFilter =
    BloomFilter.create(math.max(expectedItems, 1024), fpp)

  /** Distributed bloom over a delta's `url_hash` column, parameterized
    * identically to the running bloom so `mergeInPlace` accepts it.
    * Cost: O(delta) inserts + a fixed-size bit-array OR-reduction.
    */
  def bloomOfDelta(delta: DataFrame, expectedItems: Long, fpp: Double): BloomFilter =
    delta.stat.bloomFilter("url_hash", math.max(expectedItems, 1024), fpp)

  /** One-time full build (resume fallback when no persisted bloom
    * exists — legacy snapshots only; the steady state is incremental).
    */
  def buildBloom(spark: SparkSession, seen: DataFrame, expectedItems: Long, fpp: Double): Broadcast[BloomFilter] = {
    val bf =
      if (seen.isEmpty) emptyBloom(expectedItems, fpp)
      else bloomOfDelta(seen, expectedItems, fpp)
    spark.sparkContext.broadcast(bf)
  }

  def bloomToBytes(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def bloomFromBytes(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  // ---------------------------------------------------------------------
  // Cuckoo layer — persisted (bucket, filter_bytes) state, delta updates.
  // ---------------------------------------------------------------------

  /** Empty cuckoo state (cold start). */
  def emptyCuckooState(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Int, Array[Byte])].toDF("bucket", "filter_bytes")
  }

  /** Fold a round's delta (`url_hash` column) into the cuckoo state.
    * Cogroup on the bucket key: each task loads at most one blob,
    * inserts only the NEW keys (sorted → deterministic filter bytes for
    * a given round sequence), and emits the updated blob. Buckets with
    * no delta pass through untouched. `perBucketCapacity` only applies
    * when a bucket's filter is first created; an over-full bucket
    * saturates (degrades to all-maybe) instead of corrupting.
    */
  def updateCuckoo(
      spark: SparkSession,
      prev: DataFrame,
      delta: DataFrame,
      perBucketCapacity: Long,
      buckets: Int = CuckooBuckets,
      blobDir: Option[String] = None
  ): DataFrame = {
    import spark.implicits._
    // the session's hadoop conf (spark.hadoop.* — s3a creds, endpoints)
    // must reach the executor-side FS calls; a bare `new Configuration()`
    // would silently drop them
    val hconf = blobDir.map(_ =>
      new org.apache.spark.sql.SerializableHadoopConf(spark.sessionState.newHadoopConf()))
    val deltaKeyed = delta.select(col("url_hash").cast("long")).as[Long]
      .groupByKey(cuckooBucket(_, buckets))
    val prevKeyed = prev.select(col("bucket").cast("int"), col("filter_bytes"))
      .as[(Int, Array[Byte])].groupByKey(_._1)
    deltaKeyed.cogroup(prevKeyed) { (bucket, newKeys, prevRows) =>
      val prevBytes = prevRows.toSeq.headOption.map(_._2)
      val keys = newKeys.toArray
      val bytes =
        if (keys.isEmpty && prevBytes.isDefined)
          prevBytes.get // untouched bucket: bytes pass through
        else {
          val cf = prevBytes.map(CuckooFilter.fromBytes)
            .getOrElse(CuckooFilter.create(math.max(1024L, perBucketCapacity)))
          java.util.Arrays.sort(keys)
          keys.foreach(cf.insert) // insert failure self-saturates
          cf.toBytes
        }
      // fused blob write: the SAME pass that computes the bucket's bytes
      // writes its blob file (idempotent: deterministic bytes + tmp +
      // rename), so the cuckoo layer costs ONE job per round instead of
      // a persist + parquet write + foreachPartition triple
      blobDir.foreach(dir => writeBlobFile(dir, bucket, bytes, hconf.get.value))
      Iterator.single((bucket, bytes))
    }.toDF("bucket", "filter_bytes")
  }

  /** One raw blob file per bucket — the Iceberg-puffin-style sketch
    * layout: executors write their buckets directly to storage, and
    * lookup tasks read the bucket they need directly from storage.
    * Sketch bytes move executor↔storage only — never through the
    * driver, and never through a shuffle of the candidate rows. Uses
    * the Hadoop FS API so the same code serves file://, hdfs:// and
    * s3a:// roots. Idempotent under task retry: bytes are deterministic
    * and the visible file appears only via delete-then-rename.
    */
  private def writeBlobFile(dir: String, bucket: Int, bytes: Array[Byte],
                            conf: org.apache.hadoop.conf.Configuration): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$dir/bucket-$bucket.bin")
    val fs = p.getFileSystem(conf)
    val tmp = new Path(s"$dir/.bucket-$bucket.bin.tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"cuckoo blob rename failed: $tmp -> $p")
  }

  /** Mark a blob dir complete (write `_DONE`) — call AFTER the action
    * that ran the fused [[updateCuckoo]] with `blobDir` succeeded.
    */
  def finishCuckooDir(dir: String, conf: org.apache.hadoop.conf.Configuration): Unit = {
    val done = new org.apache.hadoop.fs.Path(s"$dir/_DONE")
    done.getFileSystem(conf).create(done, true).close()
  }

  /** Standalone blob-file write of an existing cuckoo state (spec /
    * legacy path; the crawl hot path uses the fused [[updateCuckoo]]).
    */
  def writeCuckooFiles(cuckoo: DataFrame, dir: String): Unit = {
    val hconf = new org.apache.spark.sql.SerializableHadoopConf(
      cuckoo.sparkSession.sessionState.newHadoopConf())
    cuckoo.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      rows.foreach(r => writeBlobFile(dir, r.getInt(0), r.getAs[Array[Byte]](1), hconf.value))
    }
    finishCuckooDir(dir, hconf.value)
  }

  private def driverHadoopConf: org.apache.hadoop.conf.Configuration =
    SparkSession.getActiveSession.map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  def cuckooFilesReady(dir: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$dir/_DONE")
    p.getFileSystem(driverHadoopConf).exists(p)
  }

  /** Candidate row shape inside [[filterNew]] (what CrawlJob's in-batch
    * dedup emits).
    */
  final case class Cand(url_canon: String, url_hash: Long, priority: Double, seq: Long)
  // public: generated code (SerializeFromObject) must reach the accessors
  final case class CandFlag(url_canon: String, url_hash: Long,
      priority: Double, seq: Long, sketch_new: Boolean)

  /** Filter `candidates` down to never-seen rows.
    *
    * `candidates` must carry exactly (url_canon, url_hash, priority,
    * seq). `seen` is the exact table; `cuckooDir` points at blob files
    * written by [[writeCuckooFiles]] (None or not-ready ⇒ the exact
    * join decides everything the bloom flags).
    *
    * The cuckoo check is MAP-SIDE: each executor lazily reads the
    * bucket blobs it needs straight from storage (once per executor per
    * round, via [[CuckooFileCache]]) — no shuffle of the dup-heavy
    * bloom residue, no broadcast, no driver bytes. A bucket-cogroup
    * lookup was measured first and rejected: at steady state most of
    * the residue is TRUE duplicates, and shuffling them to meet the
    * blobs cost more than the anti-join it was saving.
    */
  def filterNew(
      spark: SparkSession,
      candidates: DataFrame,
      seen: DataFrame,
      bloom: Broadcast[BloomFilter],
      cuckooDir: Option[String],
      buckets: Int = CuckooBuckets
  ): DataFrame = {
    val mightContain = udf { (h: Long) => bloom.value.mightContain(h) }

    val flagged = candidates
      .select(col("url_canon"), col("url_hash").cast("long"),
        col("priority").cast("double"), col("seq").cast("long"))
      .withColumn("maybe_seen", mightContain(col("url_hash")))
    val definitelyNew = flagged.filter(!col("maybe_seen")).drop("maybe_seen")
    val maybeSeen = flagged.filter(col("maybe_seen")).drop("maybe_seen")

    val cleared = cuckooDir.filter(cuckooFilesReady) match {
      case None => maybeSeen.withColumn("sketch_new", lit(false))
      case Some(dir) =>
        val hconf = new org.apache.spark.sql.SerializableHadoopConf(
          spark.sessionState.newHadoopConf())
        val cuckooMaybe = udf { (h: Long) =>
          CuckooFileCache.get(dir, cuckooBucket(h, buckets), hconf.value) match {
            case Some(cf) => cf.mightContain(h)
            case None => true // missing blob → exact join decides
          }
        }
        maybeSeen.withColumn("sketch_new", !cuckooMaybe(col("url_hash")))
    }

    val sketchNew = cleared.filter(col("sketch_new")).drop("sketch_new")
    val confirmed = cleared.filter(!col("sketch_new")).drop("sketch_new")
      // exact confirm (left-anti) ONLY for double-maybe rows. The seen
      // side is explicitly hinted away from a broadcast: Catalyst's size
      // estimate would happily broadcast a small seen table — i.e.
      // collect the WHOLE seen set through the driver every round, the
      // exact funnel this layer exists to avoid (at 10^10 it's fatal;
      // here it was measured as ~3-5 s/round of driver-serial time).
      // shuffle_hash keeps both sides distributed, and the candidates'
      // exchange from the upstream url_canon dedup is reused.
      .join(seen.select(col("url_canon")).hint("shuffle_hash"),
        Seq("url_canon"), "left_anti")

    definitelyNew.unionByName(sketchNew).unionByName(confirmed)
  }

  /** Round-1 API shim for specs: full cuckoo state built from scratch. */
  def buildCuckoo(spark: SparkSession, seen: DataFrame, expectedItems: Long): DataFrame =
    updateCuckoo(spark, emptyCuckooState(spark), seen.select(col("url_hash")),
      math.max(1024L, expectedItems / CuckooBuckets))
}

/** Executor-local blob-file cache: one storage read per (dir, bucket)
  * per executor JVM. Dirs are immutable once `_DONE` exists (each round
  * writes a NEW dir), so entries never go stale — but they DO go dead:
  * a finished round's dir is never read again, so the cache keeps only
  * the two most recent dirs (current + previous), evicting older ones.
  * Without eviction a long crawl would pin ~64×filter-size bytes per
  * round on every executor.
  */
object CuckooFileCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Option[CuckooFilter]]()
  private val recentDirs = new java.util.concurrent.ConcurrentLinkedDeque[String]()

  private def touch(dir: String): Unit = {
    if (!recentDirs.contains(dir)) {
      recentDirs.addFirst(dir)
      while (recentDirs.size > 2) {
        val evicted = recentDirs.pollLast()
        if (evicted != null) cache.keySet.removeIf(_._1 == evicted)
      }
    }
  }

  def get(dir: String, bucket: Int,
          conf: org.apache.hadoop.conf.Configuration = new org.apache.hadoop.conf.Configuration())
      : Option[CuckooFilter] = {
    touch(dir)
    cache.computeIfAbsent((dir, bucket), { case (d, b) =>
      val p = new org.apache.hadoop.fs.Path(s"$d/bucket-$b.bin")
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try {
          val len = fs.getFileStatus(p).getLen.toInt
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          Some(CuckooFilter.fromBytes(bytes))
        } finally in.close()
      }
    })
  }
  def clear(): Unit = { cache.clear(); recentDirs.clear() }
}
