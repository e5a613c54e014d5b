package graft.tools
import graft.{Graft, SparkEntry}

/** Prints condensed physical plans for the headline queries — the
  * review loop for "is this the plan we'd want at 100 TB". */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession(4, "plancheck")
    val dir = sys.env.getOrElse("SPARK_GRAFT_PLANCHECK_DIR", "/root/testdata/sf0.01")
    val interesting = Seq("q01_filter_project", "q02_group_agg", "q03_join_agg",
      "q07_join_broadcast", "q12_order_limit", "q17_wordcount", "q19_anti_semi",
      "q27_window_tumbling", "q31_dedup_minhash", "q33_ngram_jaccard",
      "q34_cosine_topk", "q44_join_skew", "q50_pig_join_agg",
      "q46_bloom_semi", "q54_pig_cube", "q55_tfidf", "q57_median_agg",
      "q58_quality_rules", "q59_pig_mixed_sets", "q60_pig_udf",
      "q61_pig_order_using", "q62_pig_distinct_agg", "q63_pig_agg_udf",
      "q64_pii_scrub", "q65_boilerplate", "q66_decontaminate",
      "q67_text_analyze", "q68_unigram_logprob", "q69_curate", "q49_pipeline",
      "q43_embed_neardup", "q79_embed_multiprobe",
      "q70_pigmix_l1", "q71_pigmix_l6", "q72_pigmix_l7", "q73_pigmix_l8",
      "q74_pigmix_l13", "q75_pigmix_l14", "q76_pigmix_l16",
      // VERDICT r10 item 5: the queries whose plans round 10 changed
      // were exactly the ones missing here
      "q42_ann_ivf", "q77_dedup_clusters", "q78_token_budget",
      "q80_ann_multitable",
      // r13 session 3
      "q94_dsir_weights", "q95_chunk", "q96_collected_group", "q97_pack",
      "q99_bigram_logprob", "q100_prep_pipeline", "q101_funnel",
      "q102_retention",
      // r14
      "q105_profile_approx", "q107_sentence_dedup", "q108_vocab",
      "q109_incremental_dedup",
      // r15
      "q115_span_dedup")
    // the two-phase sampler knob is a caller flag, not a queries entry —
    // probe it directly so BOTH physical forms get a printed plan
    val extra: Seq[(String, org.apache.spark.sql.SparkSession => org.apache.spark.sql.DataFrame)] = Seq(
      "q78_token_budget_twophase" -> (s =>
        graft.llm.Text.sampleByTokenBudget(
          graft.Tables.load(s, dir, "documents"),
          "doc_id", "text", "source", budgetTokens = 2000L, buckets = 32)))
    val plans = interesting.map(n => n -> SparkEntry.queries(n)(spark, dir)) ++
      extra.map { case (n, f) => n -> f(spark) }
    plans.foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      def has(s: String) = if (plan.contains(s)) s else ""
      val markers = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "HashAggregate", "TakeOrderedAndProject", "CartesianProduct", "Generate",
        "WholeStageCodegen", "PushedFilters: [", "Window").map(has).filter(_.nonEmpty)
      val exchanges = "Exchange".r.findAllIn(plan).length
      println(s"PLAN $name exchanges=$exchanges markers=${markers.mkString(",")}")
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).take(3).mkString(" | ")
      if (pushed.nonEmpty) println(s"     $name pushed: $pushed")
    }
    spark.stop()
  }
}
