package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-dup (SURVEY.md §2.8 custom state): documents arrive
  * on an unbounded stream; per-(band, bucket) state holds the
  * (id, sig) rows seen so far, and each arriving doc emits
  * hamming-verified pairs against its bucket's state — the streaming
  * twin of [[graft.datatools.Dedup.simhashIncrementalPairs]] where the
  * index lives in `flatMapGroupsWithState` state instead of a snapshot
  * table. SimHash is the right family for this: verification needs
  * only the 8-byte signature, so state is (id, sig) per doc per band
  * and no document text is ever retained.
  *
  * Guarantees: every emitted pair is exact (hamming ≤ maxDist on the
  * full 64-bit signatures — buckets propose, the signature distance
  * disposes), and across the stream's lifetime the DISTINCT emitted
  * pair set equals the batch [[graft.datatools.Dedup.simhashPairs]]
  * over all documents fed (StreamingDedupSpec pins it): a pair is
  * found when its later member arrives, exactly as an incremental
  * batch finds it when its later member's batch runs. A pair may be
  * emitted once per colliding band — distinct-ify downstream (the
  * per-micro-batch sink dedup is cheaper than cross-band coordination
  * inside the state function).
  *
  * Scale: state grows with the corpus (8 B + id, per doc per band) —
  * the streaming analog of the batch index table. Production bounds it
  * with a retention policy (GroupStateTimeout / watermark eviction) at
  * a recall cost over evicted history; unbounded here, matching the
  * batch index semantics.
  *
  * Doc ids are IMMUTABLE: a re-fed id is treated as an at-least-once
  * replay and ignored (first write wins — replay emits nothing new,
  * StreamingDedupSpec). Re-feeding an id with DIFFERENT text is
  * unsupported — the per-band guard would keep the old signature in
  * unchanged-bucket bands and admit the new one elsewhere, leaving
  * state mixed across versions; model document revisions as new ids
  * (`doc42@v2`), the same contract as the batch index's
  * delta-ids-disjoint requirement.
  */
object StreamingDedup {

  final case class DocSig(id: String, sig: Long)
  final case class DupPair(id_a: String, id_b: String, hamming: Int)

  /** `docs` is a STREAMING Dataset of (doc_id, text). */
  def simhashPairsStream(spark: SparkSession, docs: Dataset[(String, String)],
                         maxDist: Int = 3, bands: Int = 4,
                         bitsPerBand: Int = 16): Dataset[DupPair] = {
    import spark.implicits._
    require(bands > 0 && bitsPerBand > 0 && bands * bitsPerBand <= 64,
      s"banding must fit the 64-bit signature: $bands x $bitsPerBand")
    val mask = if (bitsPerBand == 64) -1L else (1L << bitsPerBand) - 1
    val banded = docs.toDF("id", "text")
      .withColumn("sig", graft.functions.MinHashExprs.simhashCol(col("text")))
      .select(col("id"), col("sig"),
        posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col("sig"), b * bitsPerBand).bitwiseAND(lit(mask))): _*))
          .as(Seq("band", "bucket")))
      .as[(String, Long, Int, Long)]
    banded
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[(String, Long, Int, Long)],
         state: GroupState[List[DocSig]]) =>
          val seen = scala.collection.mutable.ArrayBuffer.empty[DocSig]
          state.getOption.foreach(seen ++= _)
          val out = Seq.newBuilder[DupPair]
          rows.foreach { case (id, sig, _, _) =>
            // an at-least-once source may replay a doc id: state stays
            // one entry per doc per band, and a replay emits nothing new
            if (!seen.exists(_.id == id)) {
              // each row also sees earlier rows of ITS OWN micro-batch —
              // in-batch pairs need no second pass
              seen.foreach { p =>
                val h = java.lang.Long.bitCount(p.sig ^ sig)
                if (h <= maxDist)
                  out += (if (id < p.id) DupPair(id, p.id, h) else DupPair(p.id, id, h))
              }
              seen += DocSig(id, sig)
            }
          }
          state.update(seen.toList)
          out.result().iterator
      }
  }
}
