package graft.frontier

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** URL-seen dedup layer (north rule): broadcast bloom → partitioned
  * cuckoo filters → exact left-anti join. The reference has no seen set
  * (it is request-driven); this is the engine-side left-anti join of
  * SURVEY.md §2.5, with the false-positive discipline of §7.4: a sketch
  * "maybe-seen" is NEVER trusted to drop a URL — only the exact layer
  * drops.
  *
  * Layering rationale at 10^10 URLs:
  *   - the bloom (bits ∝ seen count, broadcast once per round) clears the
  *     vast majority of genuinely-new URLs without any shuffle;
  *   - the cuckoo layer is partitioned by `pmod(url_hash, buckets)` so it
  *     scales past single-broadcast memory and supports deletes; it
  *     clears bloom false-positives cheaply, co-partitioned with the
  *     candidates;
  *   - the exact seen table (same bucketing) confirms the residue via
  *     left-anti join — only rows both sketches call "maybe" pay the
  *     join.
  */
object UrlSeen {

  val CuckooBuckets = 64 // fixed sketch partitioning (independent of cluster size)

  def cuckooBucket(urlHash: Long): Int = Math.floorMod(urlHash, CuckooBuckets.toLong).toInt

  /** Build the broadcast bloom from the exact seen table. */
  def buildBloom(spark: SparkSession, seen: DataFrame, expectedItems: Long, fpp: Double): Broadcast[BloomFilter] = {
    val bf =
      if (seen.isEmpty) BloomFilter.create(math.max(expectedItems, 1024), fpp)
      else seen.stat.bloomFilter("url_hash", math.max(expectedItems, 1024), fpp)
    spark.sparkContext.broadcast(bf)
  }

  /** Build per-bucket cuckoo filters from the exact seen table.
    * Returns (bucket, filter bytes) — persisted into the snapshot.
    */
  def buildCuckoo(spark: SparkSession, seen: DataFrame, expectedItems: Long): DataFrame = {
    import spark.implicits._
    val perBucketCapacity = math.max(1024L, expectedItems / CuckooBuckets)
    seen.select(col("url_hash").cast("long"))
      .withColumn("bucket", pmod(col("url_hash"), lit(CuckooBuckets.toLong)).cast("int"))
      .as[(Long, Int)]
      .groupByKey(_._2)
      .mapGroups { (bucket, rows) =>
        val cf = CuckooFilter.create(perBucketCapacity)
        // deterministic insert order → deterministic filter bytes
        rows.map(_._1).toArray.sorted.foreach(cf.insert)
        (bucket, cf.toBytes)
      }
      .toDF("bucket", "filter_bytes")
  }

  /** Filter `candidates` down to never-seen rows.
    *
    * `candidates` must carry `url_canon` and `url_hash`. `seen` is the
    * exact table (`url_canon, url_hash, round_first_seen`). `cuckoo` may
    * be empty (cold start).
    */
  def filterNew(
      spark: SparkSession,
      candidates: DataFrame,
      seen: DataFrame,
      bloom: Broadcast[BloomFilter],
      cuckoo: DataFrame
  ): DataFrame = {
    val mightContain = udf { (h: Long) => bloom.value.mightContain(h) }

    val flagged = candidates.withColumn("maybe_seen", mightContain(col("url_hash")))
    val definitelyNew = flagged.filter(!col("maybe_seen")).drop("maybe_seen")
    val maybeSeen = flagged.filter(col("maybe_seen")).drop("maybe_seen")

    // Cuckoo layer: co-partitioned lookup; "no" is authoritative.
    val cuckooCleared: DataFrame = if (cuckoo.isEmpty) maybeSeen else {
      val cuckooMap = cuckoo.collect()
        .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
      // buckets are few and bounded (64 × ~2 bytes/key slice of the seen
      // set for THIS round's capacity); broadcast the bytes, lazily
      // deserialize once per executor.
      val bc = spark.sparkContext.broadcast(cuckooMap)
      val cuckooMaybe = udf { (h: Long) =>
        bc.value.get(cuckooBucket(h)) match {
          case Some(bytes) => CuckooFilterCache.get(cuckooBucket(h), bytes).mightContain(h)
          case None => false
        }
      }
      maybeSeen.filter(!cuckooMaybe(col("url_hash")))
        .unionByName(maybeSeen.filter(cuckooMaybe(col("url_hash")))
          // exact confirm (left-anti) ONLY for double-maybe rows
          .join(seen.select(col("url_canon")), Seq("url_canon"), "left_anti"))
    }

    val confirmed =
      if (cuckoo.isEmpty)
        maybeSeen.join(seen.select(col("url_canon")), Seq("url_canon"), "left_anti")
      else cuckooCleared

    definitelyNew.unionByName(confirmed)
  }
}

/** Executor-local deserialization cache for cuckoo filter bytes (avoid
  * re-parsing per row).
  */
object CuckooFilterCache {
  // key includes a content hash: filters change between rounds while the
  // executor JVM (and thus this cache) lives across them.
  private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, Int), CuckooFilter]()
  def get(bucket: Int, bytes: Array[Byte]): CuckooFilter =
    cache.computeIfAbsent((bucket, java.util.Arrays.hashCode(bytes)),
      _ => CuckooFilter.fromBytes(bytes))
  def clear(): Unit = cache.clear()
}
