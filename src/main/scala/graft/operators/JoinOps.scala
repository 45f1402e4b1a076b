package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / interval join operators Spark lacks natively — the two
  * custom-operator families the task brief names (as-of join, range
  * join), built as compositions of existing operators rather than a
  * custom SparkPlan: both reduce to ONE equi-shuffle plus narrow work,
  * which is the shape that survives 100×.
  *
  * (Reference analog: Gotenberg pairs each request with the LATEST
  * matching context — cookie expiry vs request deadline,
  * `chromium/tasks.go:309-313` — and scope-matches headers over URL
  * ranges, `chromium/chromium.go:412-426`; these are the same
  * latest-before and point-in-interval semantics over rows.)
  */
object JoinOps {

  /** AS-OF JOIN: for every left row, the single right row with the
    * greatest `ts` ≤ left.`ts` within the same `key` (ties on right
    * `ts` broken by greatest `ridCol` so the match is deterministic —
    * callers with unique (key, ts) right sides are unaffected).
    * Left rows without a match survive with a null payload (LEFT
    * semantics).
    *
    * Scale shape — the UNION-WINDOW form, not a range join: tag both
    * sides, union, and per key take the running `last` non-null right
    * payload over (ts, side, rid) order. ONE shuffle on the key (the
    * window partition), a per-partition sort, zero row expansion —
    * where the naive `l JOIN r ON l.key = r.key AND r.ts <= l.ts` +
    * argmax explodes to |matches| rows per left row before pruning.
    * Skewed keys share the sort cost of their own partition only.
    *
    * @param right payload columns `rightCols` are carried through as a
    *              struct and re-exposed with a `matched_` prefix
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               ridCol: String, rightCols: Seq[String]): DataFrame = {
    val rCols = (ridCol +: rightCols).distinct
    val payload = struct(rCols.map(col): _*)
    val leftCols = left.columns.toSeq
    val lStruct = struct(leftCols.map(col): _*)
    // both side-specific payloads ride as TYPED structs (one column
    // each), nulled out on the other side — never serialized (a JSON
    // carry would truncate microsecond timestamps)
    val pType = right.select(payload.as("p")).schema("p").dataType
    val lType = left.select(lStruct.as("l")).schema("l").dataType
    val r = right.select(col(key).as("__k"), col(ts).as("__t"),
      lit(0).as("__side"), col(ridCol).cast("long").as("__rid"),
      payload.as("__p"), lit(null).cast(lType).as("__l"))
    val l = left.select(col(key).as("__k"), col(ts).as("__t"),
      lit(1).as("__side"), lit(Long.MaxValue).as("__rid"),
      lit(null).cast(pType).as("__p"), lStruct.as("__l"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL keys: Spark windows place every NULL __k in ONE partition,
    // which would hand a NULL-key left row the latest NULL-key right
    // payload — but ASOF is an equi-join refinement, and NULL = NULL
    // is false there (and in the DuckDB oracle). Null the match out.
    r.unionByName(l)
      .withColumn("__match",
        when(col("__k").isNotNull,
          last(col("__p"), ignoreNulls = true).over(w))
        .otherwise(lit(null).cast(pType)))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rCols.map(c => col(s"__match.$c").as(s"matched_$c")): _*)
  }

  /** RANGE JOIN (points-in-intervals): pairs (range row, point row)
    * with same `key` and lo ≤ p < hi, WITHOUT the cartesian blowup of
    * the naive theta join. Both sides are bucketed by
    * `floor(value / bucketWidth)`: a range explodes to the few buckets
    * it spans (⌈width/bucketWidth⌉ + 1 rows), a point to exactly one,
    * and the join becomes an EQUI-join on (key, bucket) + a residual
    * interval filter. A point meets a range only in the point's own
    * bucket, so no pair is produced twice and no dedup pass is needed.
    *
    * Scale shape: one exchange per side on (key, bucket) — hash
    * partitionable, AQE-skew-splittable — where the theta join is a
    * per-key cartesian. Pick `bucketWidth` near the typical range
    * width: fanout stays ≤ 2 rows per range while buckets stay
    * selective.
    */
  def rangeJoin(ranges: DataFrame, points: DataFrame, key: String,
                rangeId: String, lo: String, hi: String,
                pointCol: String, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0)
    val rb = ranges.select(col(rangeId), col(key).as("__k"), col(lo), col(hi))
      .withColumn("__b", explode(sequence(
        floor(col(lo) / bucketWidth).cast("long"),
        floor(col(hi) / bucketWidth).cast("long"))))
    val pb = points.select(col(key).as("__k"), col(pointCol))
      .withColumn("__b", floor(col(pointCol) / bucketWidth).cast("long"))
    rb.join(pb, Seq("__k", "__b"))
      .filter(col(pointCol) >= col(lo) && col(pointCol) < col(hi))
      .select(col(rangeId), col("__k").as(key), col(lo), col(hi), col(pointCol))
  }

  /** BLOOM-PRUNED JOIN (semi-join reduction): inner equi-join where
    * the fact side is pre-filtered by a bloom filter of the dim side's
    * join keys BEFORE the join's exchange. The answer is exactly the
    * plain join — bloom false positives survive the filter but die in
    * the real join — only the bytes moved change: at 100 TB a 1%-
    * selective dim key set shrinks the fact side's shuffle ~99% for
    * the cost of one broadcast-sized bitset (~1.2 MB per million keys
    * at 1% fpp). This is Spark's own runtime-filter optimization made
    * explicit and predictable — the built-in one
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) only fires
    * under creation-cost heuristics; a pipeline that KNOWS its dim is
    * selective pins the plan instead.
    *
    * The dim side is aggregated into the bloom distributedly
    * (per-partition partials, merged) and broadcast once; the fact
    * filter is a long-probe per row, no shuffle of its own.
    *
    * Keys must be integral (the bloom is built and probed on the long
    * value; a string key would build on bytes but probe on a null
    * cast — silently dropping every row), enforced up front.
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      expectedDimRows: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    val factType = fact.schema(factKey).dataType
    val dimType = dim.schema(dimKey).dataType
    require(integral(factType) && integral(dimType),
      s"bloomPrunedJoin needs integral join keys, got $factKey: $factType, " +
        s"$dimKey: $dimType — the bloom probe is a long probe; for other " +
        "key types pre-hash both sides (e.g. xxhash64) and join on the hash")
    val spark = fact.sparkSession
    val bf = dim.stat.bloomFilter(col(dimKey).cast("long"), expectedDimRows, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val mightContain = udf { (k: Long) => bc.value.mightContainLong(k) }
    fact.filter(mightContain(col(factKey).cast("long")))
      .join(dim, col(factKey) === col(dimKey))
  }

  /** SALTED SKEW JOIN: shuffle equi-join where the fact side's join
    * key is hot (one key holding 30% of a 100-TB table serializes one
    * reducer) and the dim side is too large to broadcast. The fact
    * side gets a deterministic per-row salt in [0, numSalts); the dim
    * side replicates each row to ALL numSalts salt values; the join
    * runs on (key, salt), spreading every hot key over numSalts
    * reducers. The answer is exactly the plain join — each fact row
    * meets each matching dim row exactly once, at the fact row's own
    * salt — at the cost of shipping the dim side numSalts times.
    * Worth it exactly when |dim| × numSalts ≪ the hot key's fact rows,
    * the regime AQE's skew-join splitting also targets; this form is
    * the static variant a pipeline pins when it KNOWS the skew (AQE
    * only splits post-shuffle partitions it happens to observe, and
    * cannot split a hash-aggregated or bucketed exchange).
    *
    * The salt is `pmod(hash(saltFrom), numSalts)`: deterministic per
    * row (replayable plans), uniform, never part of the answer. The
    * dim replication is an arithmetic `explode(sequence(...))` —
    * generated, not shuffled. `shuffle_hash` is hinted on the dim side
    * so the demonstration plan stays a shuffled join even at test
    * scale where AQE would broadcast the dim (at the target scale the
    * dim doesn't fit a broadcast by assumption).
    */
  def saltedSkewJoin(fact: DataFrame, dim: DataFrame, key: String,
                     saltFrom: String, numSalts: Int): DataFrame = {
    val saltedFact = fact.withColumn(
      "_salt", pmod(hash(col(saltFrom)), lit(numSalts)))
    val repDim = dim.withColumn(
      "_salt", explode(sequence(lit(0), lit(numSalts - 1))))
    saltedFact.join(repDim.hint("shuffle_hash"), Seq(key, "_salt"))
      .drop("_salt")
  }
}
