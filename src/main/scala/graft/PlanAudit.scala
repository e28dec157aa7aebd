package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: print physical plans of representative queries for the
  * design-for-scale audit (pushdown, pruning, codegen, join strategy).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("entry() rows = " + SparkEntry.entry(spark).count())
    val d = "/root/testdata/sf0.01"
    for (name <- Seq("chan_average", "apply_flags", "join_vis",
      "split_dataset", "flag_summary", "imaging_weight_briggs", "ann_topk",
      "imaging_weight_polavg", "uv_cont_fit_order3", "dedup_exact",
      "stream_dedup", "make_image_mosaic",
      "auto_rflag", "auto_tfcrop", "reframe", "url_dedup", "pii_scrub",
      "line_dedup", "pq_search", "shard_by_tokens", "semantic_dedup",
      "decontaminate_bloom", "dsir_sample",
      // round-14 representatives: the SCD2 outer join, the survival
      // cumulative, the inversion-census aggregate, the paired-delta
      // rank test, and the streaming PH state op on the batch frame
      "scd2_apply", "logrank_test", "kendall_tau",
      "wilcoxon_signed_rank", "stream_page_hinkley",
      // round-15 representatives: the merge-on-read anti-join, the
      // version-pruned time-travel union, and the unigram corpus scan
      "delete_vectors", "time_travel", "unigram_tokenize",
      // round-16 representatives: the manifest-planned read, the
      // partition-pruned stored-index search, the trained IVFPQ, the
      // byte-fallback token scan, and the regex pretokenizer
      "manifest_read", "ann_index_persist", "ann_ivfpq",
      "unigram_tokenize_bytes", "bpe_pretokenize")) {
      println(s"########## $name ##########")
      println(Queries.all(name).fn(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
