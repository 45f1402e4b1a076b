package graft

/** The driver contract's flagship smoke: SparkEntry.entry returns a
  * non-empty frontier frame (rows > 0).
  */
class EntrySpec extends SparkSpec {
  test("SparkEntry.entry runs a crawl round and returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("url_canon") && df.columns.contains("host_hash"))
  }
}
