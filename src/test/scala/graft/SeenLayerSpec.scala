package graft

import graft.frontier.{CuckooFilter, UrlSeen}
import graft.model.SeenUrl
import org.apache.spark.sql.functions._

/** URL-seen layer: cuckoo filter invariants + the bloom→cuckoo→exact
  * discipline (a sketch may only say "definitely new", never drop).
  */
class SeenLayerSpec extends SparkSpec {

  test("cuckoo filter: no false negatives, deletes work, serde round-trips") {
    val cf = CuckooFilter.create(10000)
    val keys = (0L until 8000L).map(k => k * 2654435761L + 17)
    val inserted = keys.filter(cf.insert)
    assert(inserted.length === keys.length, "all inserts fit below load cap")
    inserted.foreach(k => assert(cf.mightContain(k), s"false negative for $k"))
    // false positive rate sane for absent keys
    val absent = (100000L until 110000L).map(k => k * 2654435761L + 17)
    val fp = absent.count(cf.mightContain).toDouble / absent.length
    assert(fp < 0.05, s"fp rate $fp")
    // serde
    val back = CuckooFilter.fromBytes(cf.toBytes)
    inserted.take(100).foreach(k => assert(back.mightContain(k)))
    // delete removes
    assert(back.delete(inserted.head))
    // deterministic bytes for same insert sequence
    val cf2 = CuckooFilter.create(10000)
    keys.foreach(cf2.insert)
    assert(java.util.Arrays.equals(cf.toBytes, cf2.toBytes))
  }

  test("filterNew: exactly the unseen urls survive, under all sketch layers") {
    import spark.implicits._
    val seen = (0 until 500).map(i => SeenUrl(s"https://h/$i", graft.functions.UrlFunctions.urlHash(s"https://h/$i"), 0)).toDF()
    val candidates = (250 until 900).map { i =>
      val u = s"https://h/$i"
      (u, graft.functions.UrlFunctions.urlHash(u), 1.0, i.toLong)
    }.toDF("url_canon", "url_hash", "priority", "seq")
    val bloom = UrlSeen.buildBloom(spark, seen, 10000, 0.03)
    val cuckoo = UrlSeen.buildCuckoo(spark, seen, 10000)
    val out = UrlSeen.filterNew(spark, candidates, seen, bloom, cuckoo)
      .select("url_canon").as[String].collect().toSet
    assert(out === (500 until 900).map(i => s"https://h/$i").toSet)
    // and without a cuckoo layer (cold start path)
    val out2 = UrlSeen.filterNew(spark, candidates, seen, bloom, spark.emptyDataFrame)
      .select("url_canon").as[String].collect().toSet
    assert(out2 === out)
  }
}
