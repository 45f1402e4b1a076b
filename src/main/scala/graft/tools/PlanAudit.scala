package graft.tools
import org.apache.spark.sql.SparkSession
/** Dumps `explain("formatted")` for the audited queries. With no args
  * it audits the full list; with args (e.g. `q110 q113`) only entries
  * whose header contains one of the given substrings run — so a single
  * query's plan can be re-checked without paying for the whole sweep.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def want(header: String): Boolean =
      args.isEmpty || args.exists(header.contains)
    def audit(header: String)(body: => Unit): Unit =
      if (want(header)) { println(s"==== $header ===="); body }
    audit("q55 repetition") {
      graft.queries.Queries.q55Repetition(spark, dir).explain("formatted") }
    audit("q57 shard_pack") {
      graft.queries.Queries.q57ShardPack(spark, dir).explain("formatted") }
    audit("q53 decontaminate") {
      graft.queries.Queries.q53Decontaminate(spark, dir).explain("formatted") }
    audit("q54 chunk_dedup") {
      graft.queries.Queries.q54ChunkDedup(spark, dir).explain("formatted") }
    audit("q56 mixture") {
      graft.queries.Queries.q56MixtureWeights(spark, dir).explain("formatted") }
    audit("q58 pii_scrub") {
      graft.queries.Queries.q58PiiScrub(spark, dir).explain("formatted") }
    audit("q59 vocab_encode") {
      graft.queries.Queries.q59VocabEncode(spark, dir).explain("formatted") }
    audit("q60 rarity_score") {
      graft.queries.Queries.q60RarityScore(spark, dir).explain("formatted") }
    audit("q61 fuzzy_decontaminate") {
      graft.queries.Queries.q61FuzzyDecontaminate(spark, dir).explain("formatted") }
    audit("q62 group_quantiles") {
      graft.queries.Queries.q62GroupQuantiles(spark, dir).explain("formatted") }
    audit("q63 classifier_score") {
      graft.queries.Queries.q63ClassifierScore(spark, dir).explain("formatted") }
    audit("q64 merge_induction (final round's plan)") {
      graft.queries.Queries.q64MergeInduction(spark, dir).explain("formatted") }
    audit("q65 containment") {
      graft.queries.Queries.q65Containment(spark, dir).explain("formatted") }
    audit("q66 snapshot_diff") {
      graft.queries.Queries.q66SnapshotDiff(spark, dir).explain("formatted") }
    audit("q67 chunk_windows") {
      graft.queries.Queries.q67ChunkWindows(spark, dir).explain("formatted") }
    audit("q68 asof_join") {
      graft.queries.Queries.q68AsofJoin(spark, dir).explain("formatted") }
    audit("q69 range_join") {
      graft.queries.Queries.q69RangeJoin(spark, dir).explain("formatted") }
    audit("q70 agg_maintain") {
      graft.queries.Queries.q70AggMaintain(spark, dir).explain("formatted") }
    audit("q71 salted_agg") {
      graft.queries.Queries.q71SaltedAgg(spark, dir).explain("formatted") }
    audit("q72 bloom_join") {
      graft.queries.Queries.q72BloomJoin(spark, dir).explain("formatted") }
    audit("q73 salted_join") {
      graft.queries.Queries.q73SaltedJoin(spark, dir).explain("formatted") }
    audit("q74 rollup_stats") {
      graft.queries.Queries.q74RollupStats(spark, dir).explain("formatted") }
    audit("q75 kmv_distinct") {
      graft.queries.Queries.q75KmvDistinct(spark, dir).explain("formatted") }
    audit("q76 phrase_pmi") {
      graft.queries.Queries.q76PhrasePmi(spark, dir).explain("formatted") }
    audit("q77 upsert") {
      graft.queries.Queries.q77Upsert(spark, dir).explain("formatted") }
    audit("q78 triangles") {
      graft.queries.Queries.q78Triangles(spark, dir).explain("formatted") }
    audit("q79 kmeans (final assignment plan)") {
      graft.queries.Queries.q79Kmeans(spark, dir).explain("formatted") }
    audit("q80 count_min") {
      graft.queries.Queries.q80CountMin(spark, dir).explain("formatted") }
    audit("q81 inverted_index") {
      graft.queries.Queries.q81InvertedIndex(spark, dir).explain("formatted") }
    audit("q82 scd2") {
      graft.queries.Queries.q82Scd2(spark, dir).explain("formatted") }
    audit("q83 funnel") {
      graft.queries.Queries.q83Funnel(spark, dir).explain("formatted") }
    audit("q84 kmv_overlap") {
      graft.queries.Queries.q84KmvOverlap(spark, dir).explain("formatted") }
    audit("q85 search") {
      graft.queries.Queries.q85Search(spark, dir).explain("formatted") }
    audit("q86 mixture_sample") {
      graft.queries.Queries.q86MixtureSample(spark, dir).explain("formatted") }
    audit("q87 zorder_layout") {
      graft.queries.Queries.q87ZorderLayout(spark, dir).explain("formatted") }
    audit("q95 hll_distinct") {
      graft.queries.Queries.q95HllDistinct(spark, dir).explain("formatted") }
    audit("q96 bigram_lm") {
      graft.queries.Queries.q96BigramLm(spark, dir).explain("formatted") }
    audit("q97 url_templates") {
      graft.queries.Queries.q97UrlTemplates(spark, dir).explain("formatted") }
    audit("q98 trustrank (final round's plan)") {
      graft.queries.Queries.q98TrustRank(spark, dir).explain("formatted") }
    audit("q99 link_spam") {
      graft.queries.Queries.q99LinkSpam(spark, dir).explain("formatted") }
    audit("q100 aimd_rate") {
      graft.queries.Queries.q100AimdRate(spark, dir).explain("formatted") }
    audit("q101 semdedup (final verdict plan)") {
      graft.queries.Queries.q101SemDedup(spark, dir).explain("formatted") }
    audit("q102 dsir_weights") {
      graft.queries.Queries.q102DsirWeights(spark, dir).explain("formatted") }
    audit("q103 label_prop (final round's plan)") {
      graft.queries.Queries.q103LabelProp(spark, dir).explain("formatted") }
    audit("q104 host_mirrors") {
      graft.queries.Queries.q104HostMirrors(spark, dir).explain("formatted") }
    audit("q105 cdc_chunks") {
      graft.queries.Queries.q105CdcChunks(spark, dir).explain("formatted") }
    audit("q106 bpe_merges (trained-table plan is driver-side; audit the pair-count round)") {
      graft.queries.Queries.q106BpeMerges(spark, dir).explain("formatted") }
    audit("q107 hybrid_rrf") {
      graft.queries.Queries.q107HybridRrf(spark, dir).explain("formatted") }
    audit("q108 bpe_encode (training collects driver-side; audit the encode scan)") {
      graft.queries.Queries.q108BpeEncode(spark, dir).explain("formatted") }
    audit("q109 leakage_split (cluster loop is iterative; audit the split join)") {
      graft.queries.Queries.q109LeakageSplit(spark, dir).explain("formatted") }
    audit("q110 lsh_audit (per-config aggs over one persisted all-pairs frame)") {
      graft.queries.Queries.q110LshAudit(spark, dir).explain("formatted") }
    audit("q111 host_rank (final round's plan; coarsen + weighted PR)") {
      graft.queries.Queries.q111HostRank(spark, dir).explain("formatted") }
    audit("q112 repeated_spans (fingerprint shuffle + islands window)") {
      graft.queries.Queries.q112RepeatedSpans(spark, dir).explain("formatted") }
    audit("q113 budget_select (quality histogram offsets, per-class windows)") {
      graft.queries.Queries.q113BudgetSelect(spark, dir).explain("formatted") }
    audit("q114 minhash_audit (slot-equality predicates over one persisted all-pairs frame)") {
      graft.queries.Queries.q114MinhashAudit(spark, dir).explain("formatted") }
    audit("q115 budget_apportion (scalar broadcasts + host-sized remainder window)") {
      graft.queries.Queries.q115BudgetApportion(spark, dir).explain("formatted") }
    audit("q116 image_neardup (decode-time aHash through the shared band-bucket join)") {
      graft.queries.Queries.q116ImageNearDup(spark, dir).explain("formatted") }
    audit("q117 hyperplane_audit (per-config bucket predicates over one persisted all-pairs frame)") {
      graft.queries.Queries.q117HyperplaneAudit(spark, dir).explain("formatted") }
    audit("q118 ivf_audit (one persisted widest-budget candidate frame, prank-prefix per config)") {
      graft.queries.Queries.q118IvfAudit(spark, dir).explain("formatted") }
    audit("q119 char_stats (single codegen histogram pass, no exchange before the sort)") {
      graft.queries.Queries.q119CharStats(spark, dir).explain("formatted") }
    audit("q121 ahash_audit (decoded-signature sample through the shared sigBandingAudit core)") {
      graft.queries.Queries.q121AhashAudit(spark, dir).explain("formatted") }
    spark.stop()
  }
}
