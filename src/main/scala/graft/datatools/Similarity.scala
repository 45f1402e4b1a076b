package graft.datatools

import org.apache.spark.sql.DataFrame
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

  /** IVF top-k: assign corpus rows to their nearest centroid, probe the
    * nProbe nearest lists per query, exact cosine within probed lists.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nList: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = pickCentroids(corpus, nList, idCol, vecCol)
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))

    // corpus → nearest centroid (broadcast cents; one pass). Ranking
    // keys round to 6 so near-tie assignment is fp-robust and matches
    // the SQL oracle twin; exact ties break on cid. Argmax is a
    // PARTIAL-AGGREGATING max_by — lexicographic max of (csim, -cid) ==
    // the old window's (csim DESC, cid ASC) rank 1, but the map-side
    // combine collapses the corpus×nList scored rows back to one row
    // per corpus_id before the exchange, and nothing sorts: at 100 TB
    // the former row_number() window was a full shuffle+sort of 16×
    // the corpus.
    val assigned = c.join(broadcast(cents))
      .withColumn("csim", round(Dedup.cosine(col("cv"), col("centroid")), 6))
      .groupBy("corpus_id")
      .agg(max_by(struct(col("cid"), col("cv")),
        struct(col("csim"), -col("cid"))).as("best"))
      .select(col("corpus_id"), col("best.cv").as("cv"), col("best.cid").as("list_id"))

    // query → nProbe nearest centroids
    val probeW = Window.partitionBy("query_id").orderBy(col("qsim").desc, col("cid"))
    val probes = q.join(broadcast(cents))
      .withColumn("qsim", round(Dedup.cosine(col("qv"), col("centroid")), 6))
      .withColumn("prank", row_number().over(probeW))
      .filter(col("prank") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid").as("list_id"))

    val scored = assigned.join(probes, Seq("list_id"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cos", round(Dedup.cosine(col("cv"), col("qv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cos", "rank")
  }
}
