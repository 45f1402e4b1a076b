package graft

import graft.datatools.InvertedIndex
import org.scalacheck.Gen

class IndexSpec extends SparkSpec {
  import spark.implicits._

  test("postings = top-k by (tf desc, doc asc) with exact df (vs brute force)") {
    val words = Seq("the", "a", "crawl", "spark", "index")
    val gen = for {
      nd <- Gen.choose(0, 30)
      docs <- Gen.listOfN(nd, Gen.listOf(Gen.oneOf(words)).map(_.mkString(" ")))
      k <- Gen.oneOf(1, 3, 8)
      minDf <- Gen.oneOf(1L, 2L, 4L)
      parts <- Gen.oneOf(1, 4)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, k, minDf, parts)
    sample(gen, 15, 19L) { case (docs, k, minDf, parts) =>
      val tf = docs.filter(_._2.trim.nonEmpty)
        .flatMap { case (id, t) => t.trim.split("\\s+").map(tok => (tok, id)) }
        .groupBy(identity).map { case ((tok, id), xs) => (tok, id, xs.size.toLong) }
      val expect = tf.groupBy(_._1).flatMap { case (tok, ps) =>
        val df = ps.size.toLong
        if (df < minDf) Nil
        else ps.toSeq.sortBy(p => (-p._3, p._2)).take(k).zipWithIndex
          .map { case ((_, id, c), i) => (tok, df, (i + 1).toLong, id, c) }
      }.toSet
      val got = InvertedIndex.postings(
          docs.toDF("doc_id", "text").repartition(parts), k, minDf)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(got === expect, s"k=$k minDf=$minDf")
    }
  }

  test("search = tf × linearized-idf top-k vs brute force") {
    val words = Seq("the", "a", "crawl", "spark", "index", "zzz")
    val gen = for {
      nd <- Gen.choose(0, 30)
      docs <- Gen.listOfN(nd, Gen.listOf(Gen.oneOf(words)).map(_.mkString(" ")))
      k <- Gen.oneOf(3, 10)
      q <- Gen.someOf("the", "crawl", "index", "missing").map(_.toSeq)
        .suchThat(_.nonEmpty)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, k, q)
    sample(gen, 15, 53L) { case (docs, k, q) =>
      val nonEmpty = docs.filter(_._2.trim.nonEmpty)
      val n = nonEmpty.size.toLong
      val tf = nonEmpty
        .flatMap { case (id, t) => t.trim.split("\\s+").filter(q.contains).map(tok => (tok, id)) }
        .groupBy(identity).map { case ((tok, id), xs) => (tok, id, xs.size.toLong) }
      val dfm = tf.groupBy(_._1).map { case (tok, ps) => tok -> ps.size.toLong }
      val expect = tf.groupBy(_._2).map { case (id, ps) =>
        (id, ps.map(p => p._3 * ((n * 1000L) / dfm(p._1))).sum, ps.size.toLong)
      }.toSeq.sortBy(r => (-r._2, r._1)).take(k)
      val got = InvertedIndex.search(docs.toDF("doc_id", "text"), q, k)
        .as[(Long, Long, Long)].collect().toSeq
      assert(got === expect, s"k=$k q=$q")
    }
  }

  test("postings buffer stays bounded: a corpus-wide stopword still yields k rows") {
    val docs = (0L until 200L).map(i => (i, "stop stop other" + i))
    val got = InvertedIndex.postings(docs.toDF("doc_id", "text"), k = 5, minDf = 1L)
      .filter($"token" === "stop").collect()
    assert(got.length === 5)
    assert(got.map(_.getLong(1)).toSet === Set(200L)) // df = every doc
    // tf=2 everywhere, ties → lowest doc ids
    assert(got.map(_.getLong(3)).sorted.toSeq === (0L until 5L))
  }
}
