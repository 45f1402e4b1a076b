package graft.datatools

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Inverted-index construction — token → bounded posting list, the
  * retrieval-side primitive (BM25 / keyword search over the corpus a
  * crawl produces; the reference's conversion routes feed exactly such
  * an index downstream).
  *
  * The scale problem is the posting list itself: `collect_list` per
  * token is unbounded (a stopword's list IS the corpus), and the
  * window formulation (`row_number` over token) sorts every token's
  * full posting stream. The fix is the same bounded-partial-agg shape
  * as [[Curation.stratifiedSample]]: a typed Aggregator that keeps the
  * top-k postings by (tf DESC, doc ASC) and the full document
  * frequency as one buffer — at most k postings + one counter leave
  * each map task per token, regardless of how hot the token is.
  */
object InvertedIndex {

  private[datatools] final case class Posting(token: String, doc_id: Long, tf: Long)

  /** (df = total docs containing the token, top-k postings kept as
    * parallel columns sorted by (tf desc, doc asc)).
    */
  final case class PostingBuf(df: Long, tfs: Seq[Long], ids: Seq[Long])

  /** Top-k postings + df in one partial-aggregating pass. Insertion-
    * order-independent: the buffer is the k largest of a multiset
    * under (tf desc, id asc), plus a commutative count.
    */
  final class TopKPostings(k: Int) extends Aggregator[Posting, PostingBuf, PostingBuf] {
    require(k >= 1)

    override def zero: PostingBuf = PostingBuf(0L, Vector.empty, Vector.empty)

    private def wins(tf1: Long, id1: Long, tf2: Long, id2: Long): Boolean =
      tf1 > tf2 || (tf1 == tf2 && id1 < id2)

    private def insert(b: PostingBuf, tf: Long, id: Long, addDf: Long): PostingBuf = {
      val n = b.tfs.size
      if (n == k && !wins(tf, id, b.tfs(n - 1), b.ids(n - 1)))
        return b.copy(df = b.df + addDf)
      var i = 0
      while (i < n && wins(b.tfs(i), b.ids(i), tf, id)) i += 1
      PostingBuf(b.df + addDf,
        ((b.tfs.take(i) :+ tf) ++ b.tfs.drop(i)).take(k),
        ((b.ids.take(i) :+ id) ++ b.ids.drop(i)).take(k))
    }

    override def reduce(b: PostingBuf, p: Posting): PostingBuf =
      insert(b, p.tf, p.doc_id, addDf = 1L)

    override def merge(a: PostingBuf, b: PostingBuf): PostingBuf = {
      var acc = a.copy(df = a.df + b.df)
      var i = 0
      while (i < b.tfs.size) { acc = insert(acc, b.tfs(i), b.ids(i), addDf = 0L); i += 1 }
      acc
    }

    override def finish(b: PostingBuf): PostingBuf = b

    override def bufferEncoder: Encoder[PostingBuf] = Encoders.product[PostingBuf]
    override def outputEncoder: Encoder[PostingBuf] = Encoders.product[PostingBuf]
  }

  /** Build the bounded inverted index: per token with document
    * frequency ≥ `minDf`, the `k` highest-tf postings (ties → lower
    * doc id), exploded to rows for oracle-stable output.
    *
    * Plan: tf = one (token, doc) exchange with map-side combine; the
    * index = one token exchange whose per-task payload is ≤ k postings
    * + a count per token. The \s+ tokenizer matches q51's.
    *
    * @return (token, df, rank, doc_id, tf), rank 1..k by (tf desc, doc asc).
    */
  def postings(docs: DataFrame, k: Int, minDf: Long = 1L,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tf = docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
      .as[Posting]
    tf.groupByKey(_.token)
      .agg(new TopKPostings(k).toColumn.name("b"))
      .flatMap { case (tok, b) =>
        if (b.df < minDf) Nil
        else b.tfs.indices.map(i => (tok, b.df, (i + 1).toLong, b.ids(i), b.tfs(i)))
      }
      .toDF("token", "df", "rank", "doc_id", "tf")
  }

  /** Keyword RETRIEVAL over the corpus: score documents against a
    * query token set by tf × linearized idf and return the top k.
    * `lidf_milli(t) = N·1000 DIV df(t)` — the fixed-point 1/df
    * weighting (rank-equivalent to idf for single-term contributions;
    * chosen over log-idf because integer arithmetic replays bit-exactly
    * in any engine, where `ln` parity is a last-ulp gamble).
    * score(d) = Σ_{t ∈ query ∩ d} tf(d,t) · lidf_milli(t); ties → lower
    * doc id.
    *
    * 100-TB shape: the query token set filters the exploded token
    * stream BEFORE the (token, doc) aggregation — everything past the
    * scan is (query-tokens × matching docs)-sized, and with the q81
    * index materialized the scan itself is replaced by |query| posting
    * lists. df joins back as a broadcast (≤ |query| rows); the final
    * top-k is TakeOrdered, never a global sort.
    *
    * @return (doc_id, score_milli, n_hit) — top `k` by (score desc,
    *         doc asc); n_hit = distinct query tokens present.
    */
  def search(docs: DataFrame, queryTokens: Seq[String], k: Int,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTokens.nonEmpty, "empty query")
    val nonEmpty = docs.filter(length(trim(col(textCol))) > 0)
    val n = nonEmpty.count()
    // persisted: two consumers (the df agg and the score join) would
    // each re-scan the corpus; (query-tokens × docs)-sized, released
    // by callers per the Verify/Bench cache contract
    val tf = nonEmpty
      .select(col(idCol).as("doc_id"), explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .filter(col("token").isin(queryTokens: _*))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
      .persist()
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("token"))
      .select(col("doc_id"),
        (col("tf") * expr(s"(${n}L * 1000) DIV df")).as("w"))
      .groupBy("doc_id")
      .agg(sum(col("w")).as("score_milli"), count(lit(1)).as("n_hit"))
      .orderBy(col("score_milli").desc, col("doc_id"))
      .limit(k)
  }

  /** BM25 retrieval (Robertson–Spärck Jones) — [[search]]'s linearized
    * tf·idf upgraded with the two signals production rankers add: term
    * SATURATION (the k₁ knob: the 50th occurrence of a token is worth
    * less than the 2nd) and document-LENGTH normalization (the b knob:
    * long pages don't win just by containing everything).
    * score(d) = Σ_t lidf(t) · tf·(k₁+1) / (tf + k₁·(1−b+b·len/avglen)),
    * all FIXED-POINT integer milli-units (k₁ = k1Milli/1000, b =
    * bMilli/1000; lidf_milli = N·1000 div df, the [[search]]
    * convention) with floor division, so the oracle replays it
    * bit-exactly — no `ln`/float ulp gamble.
    *
    * 100-TB shape: identical to [[search]] — the query token `isin`
    * filter prunes the exploded stream BEFORE the (token, doc)
    * aggregation, so everything past the scan is (query × matching
    * docs)-sized. Doc length is a PROJECTION (`size(split(...))`), not
    * a second explode; the corpus-wide (N, Σlen) scalars are one 1-row
    * agg folded back as literals; df joins back as a broadcast.
    *
    * @return (doc_id, score_micro, n_hit) — top `k` by (score desc,
    *         doc asc); score_micro = Σ lidf_milli · sat_milli
    */
  def bm25Search(docs: DataFrame, queryTokens: Seq[String], k: Int,
                 k1Milli: Long = 1200L, bMilli: Long = 750L,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTokens.nonEmpty, "empty query")
    require(bMilli >= 0 && bMilli <= 1000, "b must be in [0, 1]")
    val withLen = docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("len"))
    val Array(nDocs, sumLen) = withLen.agg(count(lit(1)), sum(col("len")))
      .head() match { case r => Array(r.getLong(0), r.getLong(1)) }
    val avgLenMilli = math.max(1L, sumLen * 1000L / math.max(nDocs, 1L))
    // persisted: the df agg and the score join both consume it
    val tf = withLen
      .select(col("doc_id"), col("len"), explode(col("toks")).as("token"))
      .filter(col("token").isin(queryTokens: _*))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"), max(col("len")).as("len"))
      .persist()
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("token"))
      .select(col("doc_id"),
        // norm_milli = (1000−b) + b·len/avglen; denom_milli = tf·1000
        // + k₁·norm/1000; sat_milli = tf·(1000+k₁)·1000 div denom
        expr(
          s"""(${nDocs}L * 1000 DIV df) *
             |  ((tf * ${1000L + k1Milli}L * 1000) DIV
             |   (tf * 1000 + (${k1Milli}L * ((1000 - ${bMilli}L) +
             |     (${bMilli}L * len * 1000) DIV ${avgLenMilli}L)) DIV 1000))"""
            .stripMargin.replaceAll("\\s+", " ").trim)
          .as("w"))
      .groupBy("doc_id")
      .agg(sum(col("w")).as("score_micro"), count(lit(1)).as("n_hit"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    * 2009): per query, fuse a lexical BM25 ranking with a dense
    * cosine ranking — rrf(d) = Σ_modality 1/(kRrf + rank_modality(d)),
    * fixed-point micros, absent-from-a-modality contributes 0. The
    * production RAG/retrieval stack's standard first-stage fusion.
    *
    * The lexical side is a MULTI-query BM25 in ONE corpus pass —
    * [[bm25Search]] generalized: tf is computed once over the union of
    * every query's terms, the (query_id, token) map joins in as a
    * broadcast literal frame, and per-query scores aggregate from the
    * shared tf frame. N queries cost one corpus scan + one tf
    * exchange, not N of either. The dense side is
    * [[Similarity.bruteForceTopK]] (query vectors = the embedding rows
    * whose vec_id matches a query_id; corpus row == query row
    * excluded, as there). Ranks use each modality's exact tie-break
    * (score desc, doc asc); fusion re-ranks by (rrf desc, doc asc).
    *
    * Scale shape (100 TB): one corpus text scan, one token-filtered tf
    * exchange (query-vocabulary-sized), one embedding scan against
    * broadcast query vectors; the fusion joins two ≤ N·k ranked frames
    * — driver never sees per-doc data. The per-query rank windows run
    * over ≤ corpus-hit rows per query, bounded by the tf filter.
    */
  def hybridRrf(docs: DataFrame, embeddings: DataFrame,
                queries: Seq[(Long, Seq[String])], k: Int,
                poolK: Int = 20, kRrf: Int = 60,
                k1Milli: Long = 1200L, bMilli: Long = 750L,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty), "empty query set")
    val spark = docs.sparkSession
    import spark.implicits._
    val allTokens = queries.flatMap(_._2).distinct
    val qmap = queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "token")
    val withLen = docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("len"))
    val Array(nDocs, sumLen) = withLen.agg(count(lit(1)), sum(col("len")))
      .head() match { case r => Array(r.getLong(0), r.getLong(1)) }
    val avgLenMilli = math.max(1L, sumLen * 1000L / math.max(nDocs, 1L))
    // ONE tf frame across every query's vocabulary; persisted for the
    // df agg + per-query score join (the bm25Search discipline)
    val tf = withLen
      .select(col("doc_id"), col("len"), explode(col("toks")).as("token"))
      .filter(col("token").isin(allTokens: _*))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"), max(col("len")).as("len"))
      .persist()
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val lexScores = tf.join(broadcast(df), Seq("token"))
      .join(broadcast(qmap), Seq("token"))
      .select(col("query_id"), col("doc_id"),
        expr(
          s"""(${nDocs}L * 1000 DIV df) *
             |  ((tf * ${1000L + k1Milli}L * 1000) DIV
             |   (tf * 1000 + (${k1Milli}L * ((1000 - ${bMilli}L) +
             |     (${bMilli}L * len * 1000) DIV ${avgLenMilli}L)) DIV 1000))"""
            .stripMargin.replaceAll("\\s+", " ").trim).as("w"))
      .groupBy("query_id", "doc_id").agg(sum(col("w")).as("score_micro"))
    val wLex = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score_micro").desc, col("doc_id"))
    val lex = lexScores.withColumn("bm25_rank", row_number().over(wLex))
      .filter(col("bm25_rank") <= poolK)
      .select(col("query_id"), col("doc_id"), col("bm25_rank"))
    val qids = queries.map(_._1)
    val dense = Similarity.bruteForceTopK(embeddings,
        embeddings.filter(col("vec_id").isin(qids: _*)), poolK)
      .select(col("query_id"), col("corpus_id").as("doc_id"),
        col("rank").as("cos_rank"))
    val fused = lex.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("bm25_rank"), lit(0)).as("bm25_rank"),
        coalesce(col("cos_rank"), lit(0)).as("cos_rank"))
      .withColumn("rrf_micros",
        expr(s"CASE WHEN bm25_rank > 0 THEN 1000000 DIV ($kRrf + bm25_rank) ELSE 0 END") +
          expr(s"CASE WHEN cos_rank > 0 THEN 1000000 DIV ($kRrf + cos_rank) ELSE 0 END"))
    val wF = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("rrf_micros").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(wF))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "bm25_rank", "cos_rank", "rrf_micros", "rank")
  }
}
