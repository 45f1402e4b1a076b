package graft.frontier

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    *
    * NOT `df.stat.bloomFilter`: its BloomFilterAggregate clamps the bit
    * array at `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`
    * (2^26 by default), so past ~7M expected items at fpp 0.01 the
    * aggregated filter silently gets a SMALLER bit size than
    * `BloomFilter.create` with the same parameters and `mergeInPlace`
    * throws IncompatibleMergeException. Per-partition filters built on
    * the executors + a treeReduce OR keep the exact (expectedItems,
    * fpp) geometry at any size; merge work stays off the driver until
    * the final reduced filter returns.
    */
  /** Per-partition partial filters are FULL-capacity (merge geometry),
    * so their count is the multiplier on the reduce traffic: at the
    * 10⁹-item broadcast ceiling each partial is ~1.2 GB, and an
    * unbounded upstream partition count (a wide delta arrives with
    * hundreds of partitions) would push partials × 1.2 GB through
    * treeReduce. The delta is coalesced (no shuffle) to at most this
    * many build partitions first — bounded reduce bytes at any width,
    * still parallel enough to hide the insert cost.
    */
  val MaxDeltaPartials = 8

  /** The delta's url_hash rows, coalesced to ≤ [[MaxDeltaPartials]]
    * partitions for partial-filter building (public for SeenLayerSpec's
    * partial-count regression).
    */
  def boundedDeltaRdd(delta: DataFrame): org.apache.spark.rdd.RDD[Long] = {
    val spark = delta.sparkSession
    import spark.implicits._
    val rdd = delta.select("url_hash").as[Long].rdd
    if (rdd.getNumPartitions > MaxDeltaPartials) rdd.coalesce(MaxDeltaPartials) else rdd
  }

  def bloomOfDelta(delta: DataFrame, expectedItems: Long, fpp: Double): BloomFilter = {
    val cap = math.max(expectedItems, 1024)
    val partials = boundedDeltaRdd(delta).mapPartitions { it =>
      val b = BloomFilter.create(cap, fpp) // created executor-side, not shipped in the closure
      it.foreach(b.putLong)
      Iterator.single(b)
    }
    if (partials.getNumPartitions == 0) emptyBloom(cap, fpp)
    else partials.treeReduce((a, b) => { a.mergeInPlace(b); a })
  }

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

  /** Persist the running bloom as ONE raw blob file, written from the
    * driver (tmp + rename; Hadoop FS API, so file:///hdfs/s3a all
    * work). The bloom is DRIVER-held state — round-tripping it through
    * a one-row LocalRelation write would serialize the full filter
    * (megabytes at real capacities) into a task closure and pay a Spark
    * job, just to move bytes the driver already has onto storage.
    */
  def writeBloomFile(bf: BloomFilter, path: String,
                     conf: org.apache.hadoop.conf.Configuration): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val tmp = new Path(path + ".tmp")
    val out = fs.create(tmp, true)
    try bf.writeTo(out) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"bloom blob rename failed: $tmp -> $p")
  }

  def readBloomFile(path: String,
                    conf: org.apache.hadoop.conf.Configuration): Option[BloomFilter] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(BloomFilter.readFrom(in)) finally in.close()
    }
  }

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
  /** Sharded-bloom spec for [[updateCuckoo]]: maintain one bloom filter
    * PER CUCKOO BUCKET as a blob file (`bloom-<bucket>.bin`) next to
    * the cuckoo blobs — the 10¹⁰-scale escape hatch for the broadcast
    * bloom (a single 10¹⁰-item filter at fpp 0.01 is ~12 GB; re-
    * broadcasting it every round dominates the fixed cost, while shards
    * move executor↔storage only, and only for buckets the round's
    * delta touched... except passthrough copies, which keep every
    * round's dir self-contained).
    */
  final case class BloomShardSpec(prevDir: Option[String], capacityPerShard: Long, fpp: Double)

  def updateCuckoo(
      spark: SparkSession,
      prev: DataFrame,
      delta: DataFrame,
      perBucketCapacity: Long,
      buckets: Int = CuckooBuckets,
      blobDir: Option[String] = None,
      bloomShards: Option[BloomShardSpec] = None
  ): DataFrame = {
    import spark.implicits._
    require(bloomShards.isEmpty || blobDir.isDefined,
      "sharded blooms need a blobDir to live in")
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
      java.util.Arrays.sort(keys) // deterministic filter bytes per delta set
      val bytes =
        if (keys.isEmpty && prevBytes.isDefined)
          prevBytes.get // untouched bucket: bytes pass through
        else {
          val cf = prevBytes.map(CuckooFilter.fromBytes)
            .getOrElse(CuckooFilter.create(math.max(1024L, perBucketCapacity)))
          keys.foreach(cf.insert) // insert failure self-saturates
          cf.toBytes
        }
      // fused blob write: the SAME pass that computes the bucket's bytes
      // writes its blob file (idempotent: deterministic bytes + tmp +
      // rename), so the cuckoo layer costs ONE job per round instead of
      // a persist + parquet write + foreachPartition triple
      blobDir.foreach(dir => writeBlobFile(dir, bucket, bytes, hconf.get.value))
      // sharded bloom rides the same pass: fold the delta into the
      // bucket's previous shard (read from the previous round's dir)
      // and write the updated shard beside the cuckoo blob
      bloomShards.foreach { spec =>
        val conf = hconf.get.value
        val bf = spec.prevDir
          .flatMap(d => readBloomFile(s"$d/bloom-$bucket.bin", conf))
          .getOrElse(org.apache.spark.util.sketch.BloomFilter.create(
            math.max(1024L, spec.capacityPerShard), spec.fpp))
        keys.foreach(bf.putLong)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        writeBlobFileNamed(blobDir.get, s"bloom-$bucket.bin", bos.toByteArray, conf)
      }
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
                            conf: org.apache.hadoop.conf.Configuration): Unit =
    writeBlobFileNamed(dir, s"bucket-$bucket.bin", bytes, conf)

  private def writeBlobFileNamed(dir: String, name: String, bytes: Array[Byte],
                                 conf: org.apache.hadoop.conf.Configuration): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$dir/$name")
    val fs = p.getFileSystem(conf)
    // attempt-unique tmp name: under speculative execution or a stage
    // retry, two attempts of the same cogroup task can run concurrently;
    // a shared `.name.tmp` would interleave their writes into one torn
    // file before rename. Each attempt writing (and renaming) its own
    // fully-written tmp keeps the delete-then-rename idempotent.
    val attempt = Option(org.apache.spark.TaskContext.get())
      .map(tc => s"attempt-${tc.taskAttemptId()}")
      .getOrElse(s"driver-${Thread.currentThread().getId}")
    val tmp = new Path(s"$dir/.$name.$attempt.tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"sketch blob rename failed: $tmp -> $p")
  }

  /** Mark a blob dir complete (write `_DONE`) — call AFTER the action
    * that ran the fused [[updateCuckoo]] with `blobDir` succeeded.
    */
  def finishCuckooDir(dir: String, conf: org.apache.hadoop.conf.Configuration): Unit = {
    val done = new org.apache.hadoop.fs.Path(s"$dir/_DONE")
    done.getFileSystem(conf).create(done, true).close()
  }

  /** Whether `dir` holds at least one committed bloom shard
    * (`bloom-<bucket>.bin` behind a `_DONE` marker). Used by the resume
    * path to detect a checkpoint that predates sharded mode: trusting
    * empty shards over a non-empty seen set would turn historical URLs
    * into bloom false NEGATIVES and silently re-admit them.
    */
  def bloomShardsPresent(dir: String, conf: org.apache.hadoop.conf.Configuration): Boolean = {
    import org.apache.hadoop.fs.Path
    val done = new Path(s"$dir/_DONE")
    val fs = done.getFileSystem(conf)
    // globStatus returns null (not empty) when the parent dir is absent
    fs.exists(done) &&
      Option(fs.globStatus(new Path(s"$dir/bloom-*.bin"))).exists(_.nonEmpty)
  }

  /** One-time bloom-shard seed from the FULL seen table — the sharded
    * twin of the legacy broadcast-bloom rebuild. Runs exactly when a
    * crawl resumes in sharded mode from a checkpoint whose blob dir has
    * no shards (pre-sharded checkpoints, or a broadcast→sharded
    * migration): each bucket's shard is built executor-side from every
    * historical url_hash, so shard "no" answers are trustworthy from
    * the first resumed round. Cost is one O(seen) pass, paid once.
    */
  def seedBloomShards(spark: SparkSession, seen: DataFrame, dir: String,
                      capacityPerShard: Long, fpp: Double,
                      buckets: Int = CuckooBuckets): Unit = {
    import spark.implicits._
    val hconf = new org.apache.spark.sql.SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    val cap = math.max(1024L, capacityPerShard)
    seen.select(col("url_hash").cast("long")).as[Long]
      .groupByKey(cuckooBucket(_, buckets))
      .mapGroups { (bucket, keys) =>
        val bf = BloomFilter.create(cap, fpp)
        keys.foreach(bf.putLong)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        writeBlobFileNamed(dir, s"bloom-$bucket.bin", bos.toByteArray, hconf.value)
        bucket
      }.write.format("noop").mode("overwrite").save() // action drives the writes
    finishCuckooDir(dir, driverHadoopConf)
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

  /** First seen layer, two deployments: the north rule's BROADCAST
    * bloom (default), or per-bucket bloom shard files for crawls whose
    * running bloom no longer fits a per-round broadcast (10¹⁰ items at
    * fpp 0.01 ≈ 12 GB — see BASELINE.md's sizing table).
    */
  sealed trait BloomLayer
  final case class BroadcastBloom(bc: Broadcast[BloomFilter]) extends BloomLayer
  /** `bloom-<bucket>.bin` shards beside the cuckoo blobs in `dir`. */
  final case class ShardedBloom(dir: String) extends BloomLayer
  /** No bloom information yet (sharded cold start): everything is
    * maybe-seen and the cuckoo/exact layers decide.
    */
  case object NoBloom extends BloomLayer

  /** Filter `candidates` down to never-seen rows.
    *
    * `candidates` must carry exactly (url_canon, url_hash, priority,
    * seq). `seen` is the exact table; `cuckooDir` points at blob files
    * written by [[writeCuckooFiles]] (None or not-ready ⇒ the exact
    * join decides everything the bloom flags).
    *
    * The cuckoo check (and the bloom check, in sharded mode) is
    * MAP-SIDE: each executor lazily reads the bucket blobs it needs
    * straight from storage (once per executor per round, via
    * [[CuckooFileCache]]/[[BloomShardCache]]) — no shuffle of the
    * dup-heavy bloom residue, no driver bytes. A bucket-cogroup
    * lookup was measured first and rejected: at steady state most of
    * the residue is TRUE duplicates, and shuffling them to meet the
    * blobs cost more than the anti-join it was saving.
    */
  def filterNew(
      spark: SparkSession,
      candidates: DataFrame,
      seen: DataFrame,
      bloom: BloomLayer,
      cuckooDir: Option[String],
      buckets: Int = CuckooBuckets
  ): DataFrame = {
    val mightContain: Column => Column = bloom match {
      case BroadcastBloom(bc) =>
        val f = udf { (h: Long) => bc.value.mightContainLong(h) }
        c => f(c)
      case ShardedBloom(dir) =>
        val hconf = new org.apache.spark.sql.SerializableHadoopConf(
          spark.sessionState.newHadoopConf())
        val f = udf { (h: Long) =>
          BloomShardCache.get(dir, cuckooBucket(h, buckets), hconf.value) match {
            case Some(bf) => bf.mightContainLong(h)
            case None => true // missing shard → downstream layers decide
          }
        }
        c => f(c)
      case NoBloom => _ => lit(true)
    }

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

  /** Broadcast-bloom convenience overload (the north-rule default). */
  def filterNew(spark: SparkSession, candidates: DataFrame, seen: DataFrame,
                bloom: Broadcast[BloomFilter], cuckooDir: Option[String]): DataFrame =
    filterNew(spark, candidates, seen, BroadcastBloom(bloom), cuckooDir, CuckooBuckets)

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

/** Executor-local bloom-SHARD cache — same lifecycle as
  * [[CuckooFileCache]] (immutable once `_DONE`, current+previous dir
  * retention) for the `bloom-<bucket>.bin` files of the sharded layer.
  */
object BloomShardCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Option[org.apache.spark.util.sketch.BloomFilter]]()
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

  def get(dir: String, bucket: Int, conf: org.apache.hadoop.conf.Configuration)
      : Option[org.apache.spark.util.sketch.BloomFilter] = {
    touch(dir)
    cache.computeIfAbsent((dir, bucket), { case (d, b) =>
      UrlSeen.readBloomFile(s"$d/bloom-$b.bin", conf)
    })
  }
  def clear(): Unit = { cache.clear(); recentDirs.clear() }
}
