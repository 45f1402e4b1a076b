package graft.datatools

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches for corpus statistics at 100-TB
  * scale, where exact `COUNT(DISTINCT)` means shuffling every distinct
  * value of every group.
  *
  * KMV (K Minimum Values, Bar-Yossef et al. 2002): keep the k smallest
  * distinct hash values per group; the k-th smallest normalized hash
  * estimates density, so distinct ≈ (k−1)/h_k. The sketch is a bounded
  * partial aggregate — each map task ships at most k longs per group,
  * two sketches merge by keeping the k smallest of their union — which
  * makes it exactly the shape Spark's `Aggregator` partial-agg contract
  * wants: one exchange of ≤ k·groups longs instead of the distinct
  * value stream. Unlike HLL (Spark's `approx_count_distinct`), every
  * step here is integer-deterministic, so an independent engine replays
  * it bit-exactly — which is what lets the DuckDB oracle hash-match the
  * estimate itself, not just an error bound.
  *
  * Hash = `md5Lower64(value) & Mask48` — the md5-low-64 twin that q52
  * pinned against DuckDB's `md5_number_lower`, masked to 48 bits so
  * both engines stay in non-negative signed-long range and the
  * fixed-point estimate `((k−1) << 48) DIV h_k` cannot overflow
  * (k ≤ 2¹⁵ keeps the numerator < 2⁶³).
  *
  * Reference analog: gotenberg tracks per-route request cardinalities
  * through its Prometheus metrics module (`pkg/gotenberg/metrics.go`);
  * at frontier scale the equivalent "distinct URLs per host" question
  * needs a sketch, not a counter.
  */
object Sketches {

  /** 48-bit hash mask: keeps md5-low-64 non-negative as a signed long
    * in BOTH engines (DuckDB's md5_number_lower is UBIGINT; Spark's is
    * signed) and bounds the estimate arithmetic.
    */
  val Mask48: Long = (1L << 48) - 1

  private[datatools] final case class GroupedHash(g: String, h: Long)

  /** Sketch state: the k smallest DISTINCT hashes seen, ascending. */
  final case class KmvState(hs: Seq[Long])

  /** Bounded distinct-min-k aggregator. `reduce` is an O(log k) binary
    * search + O(k) insert with an O(1) reject of values past the
    * current k-th; duplicates are dropped (KMV is over the distinct
    * hash SET — double-counting a re-seen value would bias the k-th
    * statistic low and the estimate high). Insertion-order-independent,
    * so partial aggregation and shuffle order cannot change the state.
    */
  final class KmvAggregator(k: Int) extends Aggregator[GroupedHash, KmvState, KmvState] {
    require(k >= 2 && k <= (1 << 15), "k must be in [2, 32768]")

    override def zero: KmvState = KmvState(Vector.empty)

    private def insert(b: KmvState, h: Long): KmvState = {
      val n = b.hs.size
      if (n == k && h >= b.hs(n - 1)) return b
      // binary search for the insertion point; equal hit = duplicate
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (b.hs(mid) < h) lo = mid + 1
        else if (b.hs(mid) > h) hi = mid
        else return b // already in the sketch
      }
      KmvState(((b.hs.take(lo) :+ h) ++ b.hs.drop(lo)).take(k))
    }

    override def reduce(b: KmvState, e: GroupedHash): KmvState = insert(b, e.h)

    override def merge(a: KmvState, b: KmvState): KmvState =
      b.hs.foldLeft(a)(insert)

    override def finish(b: KmvState): KmvState = b

    override def bufferEncoder: Encoder[KmvState] = Encoders.product[KmvState]
    override def outputEncoder: Encoder[KmvState] = Encoders.product[KmvState]
  }

  /** The md5-low-48 hash both engines agree on (see q52's bitwise-AND
    * parity note: signed long & mask == UBIGINT & mask for mask < 2⁶³).
    * A codegen expression — the sketch builds hash every value of the
    * input stream, so the scalar-UDF serde tax would be per row
    * (SketchesSpec pins expression ↔ `md5Lower64 & Mask48` parity).
    */
  def hash48(c: Column): Column =
    graft.functions.MinHashExprs.md5Low48Col(c.cast("string"))

  /** Per-group distinct-count estimate via a KMV sketch.
    *
    * Returns one row per group: `(group, n_kept, kth_hash,
    * est_distinct)` where `n_kept` = sketch fill (< k ⇒ the estimate
    * is EXACT — the sketch saw every distinct hash), `kth_hash` = the
    * k-th smallest distinct hash (the sketch's entire tail state, so
    * two engines agreeing here agree on the whole sketch), and
    * `est_distinct` = n_kept when n_kept < k, else
    * `((k−1) << 48) DIV kth_hash` — floor division, positive operands,
    * identical in Spark `DIV` and DuckDB `//`.
    *
    * 100-TB shape: one exchange of ≤ k longs per (map task, group);
    * the distinct value stream never shuffles. Sketches for different
    * partitions/days merge losslessly (`KmvAggregator.merge`), so the
    * production pattern — sketch per ingest batch, fold into a state
    * table like q70's agg-maintenance — costs O(k) per group per batch.
    * Null values are dropped (COUNT DISTINCT semantics).
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        hash48(col(valueCol)).as("h"))
      .as[GroupedHash]
      .groupByKey(_.g)
      .agg(new KmvAggregator(k).toColumn.name("sk"))
      .map { case (g, st) =>
        val n = st.hs.size
        val kth = if (n == 0) 0L else st.hs.last
        val est = if (n < k) n.toLong else ((k - 1).toLong << 48) / kth
        (g, n.toLong, kth, est)
      }
      .toDF(groupCol, "n_kept", "kth_hash", "est_distinct")
  }

  /** One ungrouped KMV sketch: the k smallest distinct md5-48 hashes
    * of `valueCol` over the whole frame, ascending. Sketch-sized (≤ k
    * longs), so collecting it to the driver is metadata movement.
    */
  def kmvSketch(df: DataFrame, valueCol: String, k: Int): Seq[Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    val states = df.filter(col(valueCol).isNotNull)
      .select(lit("").as("g"), hash48(col(valueCol)).as("h"))
      .as[GroupedHash]
      .groupByKey(_.g)
      .agg(new KmvAggregator(k).toColumn.name("sk"))
      .map(_._2.hs)
      .collect()
    if (states.isEmpty) Vector.empty else states.head
  }

  /** Set-operation estimates from two KMV sketches (Beyer et al.,
    * SIGMOD'07 "On synopses for distinct-value estimation"): combine
    * the sketches to the union's k smallest (a KMV sketch of A ∪ B by
    * construction), count how many of those the two sides share
    * (`k_inter`), and scale:
    *
    *   est_union        = KMV estimate of the combined sketch
    *   jaccard_ppm      = k_inter · 10⁶ / fill   (fill = min(k, |union sketch|))
    *   est_intersection = k_inter · est_union / fill
    *
    * When the union sketch is under-full the sketches ARE the distinct
    * hash sets and every figure is exact. All arithmetic is integer
    * (truncating division), so the oracle replays it bit-exactly.
    *
    * This is the join-size / overlap estimator a planner wants before
    * running a 100-TB join: each side's sketch is one bounded partial
    * agg (built here, or maintained incrementally like q70's state
    * tables), and the combination is O(k) driver work — metadata, not
    * data.
    *
    * @return one row: (n_a, n_b, kth_union, k_inter, est_a, est_b,
    *         est_union, est_intersection, jaccard_ppm).
    */
  def kmvIntersectEstimate(dfA: DataFrame, dfB: DataFrame, valueCol: String,
                           k: Int): DataFrame = {
    val spark = dfA.sparkSession
    import spark.implicits._
    val a = kmvSketch(dfA, valueCol, k)
    val b = kmvSketch(dfB, valueCol, k)
    def est(s: Seq[Long]): Long =
      if (s.size < k) s.size.toLong else ((k - 1).toLong << 48) / s.last
    val union = (a ++ b).distinct.sorted.take(k)
    val fill = union.size
    val kthU = if (union.isEmpty) 0L else union.last
    val estU = est(union)
    val kInter = (a.toSet & b.toSet & union.toSet).size.toLong
    val jacPpm = if (fill == 0) 0L else kInter * 1000000L / fill
    val estI = if (fill == 0) 0L else kInter * estU / fill
    Seq((a.size.toLong, b.size.toLong, kthU, kInter,
      est(a), est(b), estU, estI, jacPpm))
      .toDF("n_a", "n_b", "kth_union", "k_inter", "est_a", "est_b",
        "est_union", "est_intersection", "jaccard_ppm")
  }

  /** COUNT-MIN sketch (Cormode & Muthukrishnan 2005): `depth` rows of
    * `width` integer counters; item v increments cell
    * `hash_i(v) = md5₄₈(i ‖ ":" ‖ v) mod width` in every row; the
    * frequency estimate is the MIN over rows of the item's cells —
    * one-sided (never undercounts), error ≤ N·e/width with prob
    * 1−e^−depth. Everything is integer and the hash is the engine-
    * pinned md5-48, so the SKETCH CELLS and the estimates replay
    * bit-exactly in SQL.
    *
    * 100-TB shape: building the sketch is ONE exchange whose key space
    * is depth·width cells — map-side combine collapses the entire
    * stream into ≤ depth·width rows per task regardless of input size
    * (the definition of a sketch); estimates then need only the
    * depth·width-row cell table, broadcast below.
    *
    * @param width power of two (the cell index is a mask, and DuckDB's
    *              `&` twin needs mask semantics — see q52).
    * @return (row_i, cell, cnt) — the sketch, one row per non-empty cell.
    */
  def countMinCells(df: DataFrame, valueCol: String,
                    depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2 && (width & (width - 1)) == 0,
      "depth >= 1; width a power of two")
    // ONE input scan: each row explodes to its depth (row_i, cell)
    // pairs (a union-of-selects shape would re-read the input per row)
    val pairs = df.filter(col(valueCol).isNotNull)
      .select(explode(array((0 until depth).map { i =>
        struct(lit(i).as("row_i"),
          hash48(concat(lit(s"$i:"), col(valueCol).cast("string")))
            .bitwiseAND(lit((width - 1).toLong)).as("cell"))
      }: _*)).as("p"))
    pairs.groupBy(col("p.row_i").as("row_i"), col("p.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the count-min sketch for each distinct value of
    * `queries(valueCol)`: `est = min_i cells[i][hash_i(v)]`. The cell
    * table (≤ depth·width rows) is broadcast, so the probe side never
    * shuffles. Values hashing to empty cells estimate 0 (cannot happen
    * for values that were fed to the sketch — CM never undercounts).
    *
    * @return (value, est_cnt)
    */
  def countMinQuery(cells: DataFrame, queries: DataFrame, valueCol: String,
                    depth: Int = 4, width: Int = 1024): DataFrame = {
    // same one-scan explode shape as the build (a union-of-selects
    // would recompute the distinct per sketch row)
    val probes = queries.select(col(valueCol).cast("string").as("value"))
      .distinct()
      .select(col("value"), explode(array((0 until depth).map { i =>
        struct(lit(i).as("row_i"),
          hash48(concat(lit(s"$i:"), col("value")))
            .bitwiseAND(lit((width - 1).toLong)).as("cell"))
      }: _*)).as("p"))
      .select(col("value"), col("p.row_i").as("row_i"), col("p.cell").as("cell"))
    probes.join(broadcast(cells), Seq("row_i", "cell"), "left")
      .groupBy("value")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  private[datatools] final case class GroupedHashVal(g: String, h: Long, v: Long)

  /** Sample state: ≤ k (hash, value) pairs, ascending by hash —
    * parallel sequences so the `Encoders.product` buffer stays two
    * flat long arrays.
    */
  final case class HVSampleState(hs: Seq[Long], vs: Seq[Long])

  /** Bounded uniform-sample aggregator: keeps the rows whose KEY hash
    * is among the k smallest per group — md5 order is a uniform random
    * permutation of the keys, so the kept rows are a deterministic
    * simple random sample of size min(k, distinct keys). Same
    * insert discipline as [[KmvAggregator]]; on a hash COLLISION
    * (distinct keys, equal 48-bit hash) the smaller VALUE wins, so the
    * state is insertion-order-independent there too.
    */
  final class HashSampleAggregator(k: Int)
      extends Aggregator[GroupedHashVal, HVSampleState, HVSampleState] {
    require(k >= 2 && k <= (1 << 15), "k must be in [2, 32768]")

    override def zero: HVSampleState = HVSampleState(Vector.empty, Vector.empty)

    private def insert(b: HVSampleState, h: Long, v: Long): HVSampleState = {
      val n = b.hs.size
      if (n == k && h >= b.hs(n - 1) && h != b.hs(n - 1)) return b
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (b.hs(mid) < h) lo = mid + 1
        else if (b.hs(mid) > h) hi = mid
        else { // collision: deterministic min-value tie-break
          return if (v < b.vs(mid)) HVSampleState(b.hs, b.vs.updated(mid, v))
                 else b
        }
      }
      if (n == k && lo == k) return b
      HVSampleState(((b.hs.take(lo) :+ h) ++ b.hs.drop(lo)).take(k),
                    ((b.vs.take(lo) :+ v) ++ b.vs.drop(lo)).take(k))
    }

    override def reduce(b: HVSampleState, e: GroupedHashVal): HVSampleState =
      insert(b, e.h, e.v)

    override def merge(a: HVSampleState, b: HVSampleState): HVSampleState =
      b.hs.lazyZip(b.vs).foldLeft(a) { case (acc, (h, v)) => insert(acc, h, v) }

    override def finish(b: HVSampleState): HVSampleState = b

    override def bufferEncoder: Encoder[HVSampleState] = Encoders.product[HVSampleState]
    override def outputEncoder: Encoder[HVSampleState] = Encoders.product[HVSampleState]
  }

  /** Per-group APPROXIMATE quantiles from a bounded hash sample — the
    * third sketch family next to KMV (distinct) and count-min
    * (frequency): order statistics of a value whose cardinality is
    * unbounded. [[Curation.groupQuantiles]] is exact but collapses the
    * corpus onto (stratum, value) rows first — perfect for token
    * counts (≤ ~10⁶ distinct values), hopeless for latency micros or
    * byte sizes at 100 TB, where the collapse IS the corpus. Here each
    * map task ships ≤ k (hash, value) pairs per group, sketches merge
    * losslessly, and the estimate is the sample's exact quantile by
    * the q62 integer rule (k-th smallest, k = ⌈q·n⌉, 1-indexed over
    * n = sample size). Under-full group (n < k) ⇒ the sample IS the
    * group and the quantile is exact. Sampling by the KEY's md5 order
    * keeps the draw engine-independent: the DuckDB twin re-derives the
    * identical sample with a row_number over the same 48-bit hash.
    *
    * @param keyCol distinct row identity (the sample is uniform over
    *               its distinct values); nulls dropped
    * @param value  integer metric column (cast to long)
    * @return one row per (group, q): (stratum, q_ppm, n_sample, value)
    */
  def sampleQuantiles(df: DataFrame, groupCol: String, keyCol: String,
                      value: Column, k: Int,
                      qsPpm: Seq[Long] = Seq(500000L, 900000L, 990000L)): DataFrame = {
    require(qsPpm.nonEmpty && qsPpm.forall(q => q > 0 && q <= 1000000L))
    val spark = df.sparkSession
    import spark.implicits._
    val qs = qsPpm.toArray
    df.filter(col(keyCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        hash48(col(keyCol)).as("h"), value.cast("long").as("v"))
      .as[GroupedHashVal]
      .groupByKey(_.g)
      .agg(new HashSampleAggregator(k).toColumn.name("sk"))
      .flatMap { case (g, st) =>
        val sorted = st.vs.sorted
        val n = sorted.size.toLong
        qs.map { q =>
          val kth = ((q * n + 999999L) / 1000000L).toInt // ⌈q·n⌉, ≥ 1
          (g, q, n, sorted(math.max(kth - 1, 0)))
        }
      }
      .toDF("stratum", "q_ppm", "n_sample", "value")
  }

  /** HLL registers: m = 64 buckets (p = 6 index bits of the 48-bit
    * hash), so a register holds the max "rank" (position of the first
    * set bit, 1-based) of the remaining 42 hash bits — rank ∈ [1, 43],
    * 43 meaning all 42 bits were zero. 64 bytes per group, total.
    */
  val HllM: Int = 64
  private val HllRankBits = 42 // 48 hash bits − 6 index bits

  /** Fixed-point α₆₄ = 0.7213 / (1 + 1.079/64) ≈ 0.709337, in micro
    * units — pinned as a constant so the SQL twin inlines the same
    * number (the estimator needs both engines to agree, not the
    * "true" α to the last digit).
    */
  val HllAlphaMicro: Long = 709337L

  /** α₆₄·m²·2³⁰ in micro units: the estimator numerator, < 2⁶². */
  val HllNumerator: Long = HllAlphaMicro * HllM * HllM * (1L << 30)

  /** Linear-counting table: LC(V) = round(m·ln(m/V)) for V = zero
    * registers ∈ [1, 64] — the small-range correction (raw HLL biases
    * high when most registers are empty) as a PINNED integer lookup,
    * so both engines replay ln() bit-exactly. Applied when the raw
    * estimate ≤ 2.5·m and V > 0 (Flajolet et al. 2007 §4).
    */
  val HllLcTable: Array[Long] = Array(
    266, 222, 196, 177, 163, 151, 142, 133, 126, 119, 113, 107, 102, 97,
    93, 89, 85, 81, 78, 74, 71, 68, 65, 63, 60, 58, 55, 53, 51, 48, 46,
    44, 42, 40, 39, 37, 35, 33, 32, 30, 28, 27, 25, 24, 23, 21, 20, 18,
    17, 16, 15, 13, 12, 11, 10, 9, 7, 6, 5, 4, 3, 2, 1, 0)

  final case class HllState(regs: Array[Byte])

  /** Mergeable HLL register aggregator (Flajolet et al. 2007). Each
    * map task ships 64 bytes per group; two states merge by
    * element-wise max — insertion-order-independent by construction,
    * the canonical distributed-cardinality sketch. Where [[KmvDistinct]]
    * spends k longs for a (k−1)/h_k estimate, HLL spends 64 BYTES for
    * ~13% standard error — the variant you keep per (host, day) in a
    * million-row state table.
    */
  final class HllAggregator extends Aggregator[GroupedHash, HllState, HllState] {
    override def zero: HllState = HllState(new Array[Byte](HllM))

    override def reduce(b: HllState, e: GroupedHash): HllState = {
      val bucket = (e.h & (HllM - 1)).toInt
      val w = e.h >>> 6 // the 42 rank bits
      // rank = 1 + leading zero count WITHIN the 42-bit window; w == 0
      // saturates at 43 (all window bits zero)
      val rank =
        if (w == 0L) (HllRankBits + 1).toByte
        else (HllRankBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
      if (rank > b.regs(bucket)) b.regs(bucket) = rank
      b
    }

    override def merge(a: HllState, b: HllState): HllState = {
      var i = 0
      while (i < HllM) {
        if (b.regs(i) > a.regs(i)) a.regs(i) = b.regs(i)
        i += 1
      }
      a
    }

    override def finish(b: HllState): HllState = b

    override def bufferEncoder: Encoder[HllState] = Encoders.product[HllState]
    override def outputEncoder: Encoder[HllState] = Encoders.product[HllState]
  }

  /** Per-group distinct-count estimate via 64-register HLL. All
    * arithmetic is integer (ln() enters only through the pinned
    * [[HllLcTable]]), so an independent engine replays the estimate:
    *
    *   reg_sum = Σ_buckets (2³⁰ >> reg)        (zero regs add 2³⁰)
    *   raw     = (α₆₄·m²·2³⁰ // reg_sum) // 10⁶   (nested floor divs)
    *   est     = if raw ≤ 2.5·m and V > 0 then LC(V) else raw
    *
    * 100-TB shape: ONE exchange of 64 bytes per (map task, group) —
    * the per-group cost is CONSTANT, unlike KMV's k longs, so this is
    * the sketch for per-host / per-shard distinct counts maintained
    * incrementally (merge = byte-wise max, q70's state-table pattern).
    *
    * @return (group, n_zero_regs, reg_sum, est_distinct) — `reg_sum`
    *         is a checksum of the whole register state, so two engines
    *         agreeing on it agree on (a projection of) the sketch.
    */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        hash48(col(valueCol)).as("h"))
      .as[GroupedHash]
      .groupByKey(_.g)
      .agg((new HllAggregator).toColumn.name("sk"))
      .map { case (g, st) =>
        var regSum = 0L
        var nZero = 0L
        var i = 0
        while (i < HllM) {
          val r = st.regs(i)
          if (r == 0) nZero += 1
          regSum += (1L << 30) >> r
          i += 1
        }
        val raw = HllNumerator / regSum / 1000000L
        val est =
          if (raw <= 5L * HllM / 2 && nZero > 0) HllLcTable(nZero.toInt - 1)
          else raw
        (g, nZero, regSum, est)
      }
      .toDF(groupCol, "n_zero_regs", "reg_sum", "est_distinct")
  }
}
