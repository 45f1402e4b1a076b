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
}
