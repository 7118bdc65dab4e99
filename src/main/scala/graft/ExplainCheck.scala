package graft
import graft.operators._
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("explain", "8", 32)
    val dir = "/root/testdata/sf0.01"
    def check(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      val scans = "Scan parquet".r.findAllIn(plan).length
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
      val smj = "SortMergeJoin".r.findAllIn(plan).length
      val shj = "ShuffledHashJoin".r.findAllIn(plan).length
      val ex = "Exchange".r.findAllIn(plan).length
      val wsc = "WholeStageCodegen".r.findAllIn(plan).length
      val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(df.queryExecution.toString).length
      println(f"[explain] $name%-22s scans=$scans bhj=$bhj smj=$smj shj=$shj exch=$ex codegen=$wsc pushedFilters=$pushed")
    }
    check("q1", Analytics.q1PricingSummary(spark, dir))
    check("q3", Analytics.q3ShippingPriority(spark, dir))
    check("q5", Analytics.q5LocalSupplier(spark, dir))
    check("sessionize", Analytics.sessionize(spark, dir))
    check("topk_per_group", Analytics.topkPerGroup(spark, dir))
    check("fallback_resolve", RefDemos.fallbackResolve(spark, dir))
    check("diff_merge_carry", RefDemos.diffMergeCarry(spark, dir))
    check("merge_max_groups", RefDemos.mergeMaxGroups(spark, dir))
    check("minhash_lsh", TextDemos.dedupMinhashLsh(spark, dir))
    check("embed_cosine_topk", TextDemos.embedCosineTopk(spark, dir))
    check("geocode_candidates", RefDemos.geocodeCandidates(spark, dir))
    check("geocode_validate", RefDemos.geocodeValidate(spark, dir))
    check("schema_validate", RefDemos.schemaValidate(spark, dir))
    check("contamination", TextDemos.contaminationCheck(spark, dir))
    check("sequence_pack", TextDemos.sequencePack(spark, dir))
    check("url_blocklist", TextDemos.urlBlocklistFilter(spark, dir))
    check("outlier_bounds", TextDemos.outlierBoundsFilter(spark, dir))
    check("line_dedup", TextDemos.lineDedup(spark, dir))
    check("scd2_history", Analytics.scd2History(spark, dir))
    check("bloom_semi_join", Analytics.bloomSemiJoinDemo(spark, dir))
    check("lm_score", TextDemos.lmScore(spark, dir))
    check("source_mix", TextDemos.sourceMix(spark, dir))
    check("dup_span_detect", TextDemos.dupSpanDetect(spark, dir))
    check("training_prep_e2e", TextDemos.trainingPrepTail(spark, dir))
    check("q3_shipping_bloom", Analytics.q3ShippingPriorityBloom(spark, dir))
    check("pq_encode", TextDemos.pqEncodeDemo(spark, dir))
    check("pq_topk", TextDemos.pqTopkDemo(spark, dir))
    check("bpe_encode", TextDemos.bpeEncode(spark, dir))
    check("bm25_topk", TextDemos.bm25Topk(spark, dir))
    check("group_sample", TextDemos.groupSampleDemo(spark, dir))
    check("bigram_lm_score", TextDemos.bigramLmScore(spark, dir))
    graft.util.CacheRegistry.releaseAll()
    spark.stop()
  }
}
