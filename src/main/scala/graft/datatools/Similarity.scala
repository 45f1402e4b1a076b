package graft.datatools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline
  *     (queries broadcast against the corpus; one pass, no index).
  *   - [[ivfTopK]]: IVF-style scale path — corpus assigned to nList
  *     deterministic centroids; queries probe the nProbe nearest lists
  *     only, cutting scanned rows by ~nList/nProbe. At 100 TB the
  *     centroid assignment is the only full pass; per-query work is
  *     bounded by the probed lists.
  *   - [[ivfTopKF32]]: the same index with float32-compressed list
  *     payloads + exact re-rank — halves the bytes a probed-list scan
  *     touches (4 B vs 8 B per dim; 256 GB instead of 512 GB of hot
  *     payload at 10⁹ × 64 dims), the memory path past 10⁹ vectors.
  *
  * Ranking tiebreak is always (similarity DESC, corpus id ASC) so top-k
  * is deterministic and oracle-comparable.
  */
object Similarity {

  /** Exact top-k by cosine for each query id. `queries` and `corpus`
    * both have (id, vec) shape; queries are expected small (broadcast).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .withColumn("cos", round(Dedup.cosine(col("cv"), col("qv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cos", "rank")
  }

  /** Deterministic centroid pick: the nList corpus vectors with the
    * smallest md5(id-as-string) — uniform pseudo-random, reproducible,
    * no iteration (k-means would converge better; determinism and
    * one-pass cost win here, and probing covers the slack). md5 of the
    * decimal id is chosen over Spark's murmur `hash()` so the pick —
    * and therefore the whole IVF plan — has an exact SQL oracle twin
    * (q35: `ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT nList`).
    */
  def pickCentroids(corpus: DataFrame, nList: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("centroid"))
      .orderBy(md5(col("cid").cast("string")), col("cid"))
      .limit(nList)

  /** The centroid table, collected: (cid, vector) pairs + dim. ONE
    * corpus pass (the md5-ordered pick); the result is a bounded
    * driver-side object by construction — nList is an index parameter
    * (16 here, ≤ ~2¹⁴ at 10⁹+ vectors ≈ 8 MB), the same small table
    * every IVF implementation holds to route queries.
    */
  private def collectCentroids(corpus: DataFrame, nList: Int,
                               idCol: String, vecCol: String): Seq[(Long, Seq[Double])] =
    pickCentroids(corpus, nList, idCol, vecCol).collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1)))

  /** Empty-corpus result with the top-k schema. */
  private def emptyTopK(c: DataFrame, q: DataFrame): DataFrame =
    c.join(q, col("corpus_id") === col("query_id") && lit(false))
      .select(col("query_id"), col("corpus_id"), lit(0.0).as("cos"), lit(0).as("rank"))

  /** query → nProbe nearest centroids (queries are small; the window
    * over query_id is per-query top-N of nList rows). The centroid
    * frame is rebuilt from the collected rows — no second corpus pass.
    */
  private def probesFor(q: DataFrame, centroids: Seq[(Long, Seq[Double])],
                        nProbe: Int): DataFrame =
    probesRanked(q, centroids, nProbe).drop("prank")

  /** [[probesFor]] keeping the probe rank — the audit path filters one
    * widest-budget frame down to each narrower budget by `prank`.
    */
  private def probesRanked(q: DataFrame, centroids: Seq[(Long, Seq[Double])],
                           nProbe: Int): DataFrame = {
    val spark = q.sparkSession
    import spark.implicits._
    val centsDf = centroids.toDF("cid", "centroid")
      .withColumn("centroid", col("centroid").cast("array<double>"))
    val probeW = Window.partitionBy("query_id").orderBy(col("qsim").desc, col("cid"))
    q.join(broadcast(centsDf))
      .withColumn("qsim", round(Dedup.cosine(col("qv"), col("centroid")), 6))
      .withColumn("prank", row_number().over(probeW))
      .filter(col("prank") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid").as("list_id"), col("prank"))
  }

  /** corpus → nearest centroid in ONE narrow projection: the fused
    * argmax expression scans the broadcast centroid matrix per row — no
    * explode-join, no exchange, no sort; same (round(csim,6) DESC, cid
    * ASC) ranking as the window/max_by forms it replaced (DatatoolsSpec
    * pins the parity, PLANS.md has the plan history).
    */
  private def assignLists(c: DataFrame, centroids: Seq[(Long, Seq[Double])],
                          dim: Int): DataFrame =
    c.withColumn("list_id",
      graft.functions.NearestCentroidExprs.nearestCol(col("cv"), centroids, dim))

  /** IVF top-k: assign corpus rows to their nearest centroid, probe the
    * nProbe nearest lists per query, exact cosine within probed lists.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nList: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = collectCentroids(corpus, nList, idCol, vecCol)
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    if (centroids.isEmpty) return emptyTopK(c, q)
    val assigned = assignLists(c, centroids, centroids.head._2.length)
    val scored = assigned.join(probesFor(q, centroids, nProbe), Seq("list_id"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cos", round(Dedup.cosine(col("cv"), col("qv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cos", "rank")
  }

  /** Probe-budget audit for the IVF index — the q110/q114/q117
    * banding-audit treatment applied to the engine's FOURTH
    * candidate-pruning layer, so every approximate structure (three
    * sketch families + the ANN index) can be tuned against exact
    * ground truth before its parameters are committed at scale. Each
    * budget probes the SAME index (the nList deterministic centroids):
    * `scanned` counts the candidate rows the probed lists admit (the
    * cost axis — what a 100 TB operator pays per query), `recall_ppm`
    * is the probed top-k's overlap with the exact brute-force top-k
    * (the quality axis). All budgets share ONE persisted candidate
    * frame scored at the widest budget — a narrower budget's candidate
    * set is exactly its `prank`-prefix — and the exact ground truth is
    * computed once; only the cheap per-budget top-k rank and two
    * count aggregates re-run per config. Queries are a bounded sample
    * by contract (ground truth is a full corpus scan per query — the
    * same reason the banding audits run on sampled slices).
    */
  def ivfProbeAudit(corpus: DataFrame, k: Int = 5, nList: Int = 16,
                    probes: Seq[Int] = Seq(1, 2, 4, 8), nQueries: Int = 10,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(probes.nonEmpty && probes.forall(p => p > 0 && p <= nList),
      s"probe budgets must be in [1, $nList]")
    val queries = corpus.filter(col(idCol) < nQueries)
    val centroids = collectCentroids(corpus, nList, idCol, vecCol)
    if (centroids.isEmpty) { // empty corpus: a zero audit row per budget
      val spark = corpus.sparkSession
      import spark.implicits._
      return probes.map(p => (p, 0L, 0L, 0L, 0L))
        .toDF("n_probe", "n_truth", "scanned", "n_hits", "recall_ppm")
    }
    val truth = bruteForceTopK(corpus, queries, k, idCol, vecCol)
      .select("query_id", "corpus_id").persist()
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val assigned = assignLists(c, centroids, centroids.head._2.length)
    val cand = assigned.join(probesRanked(q, centroids, probes.max), Seq("list_id"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        round(Dedup.cosine(col("cv"), col("qv")), 6).as("cos"), col("prank"))
      .persist()
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id"))
    val perBudget = probes.map { p =>
      val mine = cand.filter(col("prank") <= p)
      val hits = mine.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .join(truth, Seq("query_id", "corpus_id"))
      mine.agg(count(lit(1)).as("scanned"))
        .join(hits.agg(count(lit(1)).as("n_hits")))
        .select(lit(p).as("n_probe"), col("scanned"), col("n_hits"))
    }.reduce(_ unionByName _)
    perBudget.join(truth.agg(count(lit(1)).as("n_truth")))
      .select(col("n_probe"), col("n_truth"), col("scanned"), col("n_hits"),
        expr("CASE WHEN n_truth > 0 THEN (n_hits * 1000000) DIV n_truth ELSE 0 END")
          .as("recall_ppm"))
  }

  /** IVF with FLOAT32-compressed list payloads + exact re-rank — the
    * 10⁹+-vector memory path. [[ivfTopK]]'s probed lists store and scan
    * full float64 arrays; at a billion 64-dim embeddings that is 512 GB
    * of hot list payload. Here the lists carry float32-quantized
    * vectors (half the bytes scanned and shuffled — the win grows with
    * any further SQ/PQ step, which would slot into the same two-phase
    * shape), the probed-list scan ranks by QUANTIZED cosine, and only
    * the top `rerank` candidates per query gather their full-precision
    * vectors (a ~rerank×queries row join, not a corpus pass) for the
    * exact final top-k.
    *
    * Quantization is IEEE double→float→double rounding — bit-identical
    * in Spark (`cast(array<float>)`) and DuckDB (`::REAL[]::DOUBLE[]`),
    * so the whole two-phase pipeline keeps an exact SQL oracle twin
    * (q40). Centroid assignment happens on full-precision vectors (an
    * index-build-time step) via the same fused argmax expression as
    * [[ivfTopK]].
    */
  def ivfTopKF32(corpus: DataFrame, queries: DataFrame, k: Int,
                 nList: Int = 16, nProbe: Int = 4, rerank: Int = 20,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfTopKCompressed(corpus, queries, k, nList, nProbe, rerank,
      cv => cv.cast("array<float>").cast("array<double>"), idCol, vecCol)

  /** IVF with 8-BIT scalar quantization (SQ8) of the list payloads —
    * 1 byte/dim + a per-vector (min, scale) pair vs float64's 8 B/dim:
    * an ~8× payload reduction (64 GB instead of 512 GB of hot list
    * bytes at 10⁹ × 64 dims). Same two-phase shape as [[ivfTopKF32]]:
    * the probed-list scan ranks on dequantized values
    * ([[graft.functions.Sq8Exprs]] round-trip, oracle-twinnable because
    * every step is a plain IEEE double op), exact re-rank recovers
    * full-precision ordering for the survivors.
    */
  def ivfTopKSQ8(corpus: DataFrame, queries: DataFrame, k: Int,
                 nList: Int = 16, nProbe: Int = 4, rerank: Int = 20,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfTopKCompressed(corpus, queries, k, nList, nProbe, rerank,
      graft.functions.Sq8Exprs.roundTripCol, idCol, vecCol)

  /** IVF with PRODUCT-QUANTIZED list payloads (Jégou et al., TPAMI
    * 2011) — the compression tier past SQ8: the 64-dim payload stores
    * as `m` codeword indices (`m·log2(numCodes)` bits/vector; at
    * production m=8 × 256 codes that is 8 B vs float64's 512 B — 64×,
    * i.e. 8 GB of hot list bytes at 10⁹ × 64 dims). Same two-phase
    * shape as [[ivfTopKF32]]/[[ivfTopKSQ8]]: the probed-list scan ranks
    * on the RECONSTRUCTION ([[graft.functions.PqExprs]] round-trip —
    * per subspace, the nearest codeword by round-6 L2, ties to the
    * smallest index), exact re-rank recovers full precision for the
    * survivors.
    *
    * The codebook is training-free and oracle-twinnable: the
    * `numCodes` md5-ordered sample vectors (the same deterministic
    * pick as [[pickCentroids]]), each sliced into its `m` subvectors —
    * one bounded corpus pass, no k-means. At 10⁹+ vectors a trained
    * codebook recalls better; the index SHAPE (codes in lists, ADC
    * scan, exact re-rank) is what this pins, and a trained codebook
    * drops into the same `quantize` slot.
    */
  def ivfTopKPQ(corpus: DataFrame, queries: DataFrame, k: Int,
                nList: Int = 16, nProbe: Int = 4, rerank: Int = 20,
                m: Int = 4, numCodes: Int = 32,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sample = collectCentroids(corpus, numCodes, idCol, vecCol)
    if (sample.isEmpty) {
      val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("cv"))
      val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      return emptyTopK(c, q)
    }
    val dim = sample.head._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    val codebook: Seq[Seq[Seq[Double]]] =
      (0 until m).map(s => sample.map(_._2.slice(s * subDim, (s + 1) * subDim)))
    ivfTopKCompressed(corpus, queries, k, nList, nProbe, rerank,
      cv => graft.functions.PqExprs.roundTripCol(cv, codebook), idCol, vecCol)
  }

  /** Shared two-phase compressed-IVF pipeline; `quantize` models the
    * list storage format (the scan sees its output).
    */
  private def ivfTopKCompressed(corpus: DataFrame, queries: DataFrame, k: Int,
                                nList: Int, nProbe: Int, rerank: Int,
                                quantize: Column => Column,
                                idCol: String, vecCol: String): DataFrame = {
    require(rerank >= k, s"rerank window $rerank must cover k=$k")
    val centroids = collectCentroids(corpus, nList, idCol, vecCol)
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    if (centroids.isEmpty) return emptyTopK(c, q)

    // the persisted list payload: assignment from full precision, the
    // heavy per-row array quantized
    val lists = assignLists(c, centroids, centroids.head._2.length)
      .withColumn("cvq", quantize(col("cv")))
      .select("list_id", "corpus_id", "cvq")

    // phase 1: probed-list scan on the QUANTIZED payload
    val wq = Window.partitionBy("query_id").orderBy(col("cos_q").desc, col("corpus_id"))
    val candidates = lists.join(probesFor(q, centroids, nProbe), Seq("list_id"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cos_q", round(Dedup.cosine(col("cvq"), col("qv")), 6))
      .withColumn("qrank", row_number().over(wq))
      .filter(col("qrank") <= rerank)
      .select("query_id", "qv", "corpus_id")

    // phase 2: exact re-rank — gather full-precision vectors for the
    // surviving candidates only
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id"))
    candidates.join(c, Seq("corpus_id"))
      .withColumn("cos", round(Dedup.cosine(col("cv"), col("qv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cos", "rank")
  }

  /** Fixed-point Lloyd k-means — the TRAINING step the IVF family
    * above assumes (its "deterministic centroids" are the untrained
    * stand-in; this is how a real index learns them). All arithmetic
    * is integer so an independent engine replays it bit-exactly:
    * vectors scale to longs by `floor(x·scale + 0.5)` (the q42
    * IEEE-exact rounding), distances are integer squared-L2, and the
    * centroid update is integer mean `sum DIV n` — Scala `/`, Spark
    * `DIV`, and DuckDB `//` all truncate toward zero (pinned in
    * DatatoolsSpec), so negative coordinate sums cannot diverge.
    *
    * Initialization: the k vectors with the smallest ids, cluster j =
    * rank in id order (deterministic, engine-independent). Empty
    * clusters keep their previous centroid. Ties in assignment break
    * to the lower cluster id (lexicographic (dist, j) min).
    *
    * 100-TB shape: per iteration, assignment is a PURE PROJECTION —
    * the k·dim centroid table rides into the plan as array literals
    * (k ≤ ~10³; past that you shard the centroid set and this becomes
    * the IVF coarse quantizer itself), so the corpus is read once with
    * zero exchanges — and the update is ONE partial-agg exchange of
    * (cluster, dim-sums) rows: map tasks combine locally, k·dim longs
    * cross the wire per task. The k×(dim+1) update frame collects to
    * the driver (bytes, not data) to become the next round's literals.
    * Nothing iterative touches disk; `iters` is small by design
    * (production trains on a sample, then assigns once — the
    * assignment pass IS [[ivfTopK]]'s build step).
    *
    * @return final assignment after `iters` updates:
    *         (vec_id, cluster, dist) — dist = integer squared L2 to
    *         the final centroid, the full argmin witness.
    */
  def kmeansAssign(embeddings: DataFrame, k: Int, iters: Int,
                   scale: Long = 1000000L, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && iters >= 0)
    val ints = embeddings.select(col(idCol).cast("long").as("id"),
      // widen float → double BEFORE the multiply: a float-precision
      // product can floor one off from the oracle's ::DOUBLE[] path
      expr(s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * ${scale}d + 0.5d) AS BIGINT))").as("v"))
    val first = ints.orderBy("id").limit(k).collect()
    require(first.nonEmpty, "kmeansAssign: empty input")
    var cents: Array[Array[Long]] =
      first.map(_.getSeq[Long](1).toArray)
    val dim = cents(0).length

    // (dist, j) struct per centroid; array_min picks the lexicographic
    // minimum = nearest centroid, ties to the lower j
    def bestCol: Column = {
      val cands = cents.zipWithIndex.map { case (c, j) =>
        val d = aggregate(
          zip_with(col("v"), typedLit(c.toSeq), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x)
        struct(d.as("d"), lit(j).as("j"))
      }
      array_min(array(cands.toIndexedSeq: _*))
    }

    var it = 0
    while (it < iters) {
      val sums = ints.select(bestCol.getField("j").as("cluster"), col("v"))
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"),
          (0 until dim).map(d => sum(col("v")(d)).as(s"s$d")): _*)
        .collect()
      val next = cents.map(_.clone()) // empty clusters carry over
      sums.foreach { r =>
        val j = r.getInt(0); val n = r.getLong(1)
        next(j) = Array.tabulate(dim)(d => r.getLong(2 + d) / n)
      }
      cents = next
      it += 1
    }
    // one struct evaluation per row (codegen CSE also catches the
    // getField pair, but don't rely on it)
    ints.select(col("id").as(idCol), bestCol.as("b"))
      .select(col(idCol), col("b.j").as("cluster"), col("b.d").as("dist"))
  }
}
