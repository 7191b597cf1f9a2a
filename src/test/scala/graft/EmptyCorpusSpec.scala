package graft

/** Empty-input totality: every documents/embeddings-family catalog
  * entry must run (and usually return 0 rows) on EMPTY tables — empty
  * partitions, empty incremental batches, and freshly-truncated
  * landing zones are routine at scale, and an operator that throws on
  * them (ANSI divide, max over nothing, head of empty) is a paged
  * on-call, not a query result. The recall gates have their own
  * vacuous-TRUE contract in RecallGateSpec; the streaming entries
  * (x51/x52) are excluded by design — they assert a non-empty
  * single-batch landing.
  */
class EmptyCorpusSpec extends SparkSpec {

  private val docFamily = Seq(
    "x01_dedup_exact", "x02_jaccard_pairs", "x03_minhash_lsh",
    "x03p_minhash_lsh_prod", "x04_simhash_pairs", "x04p_simhash_prod",
    "x05_cosine_topk", "x06_cosine_lsh", "x07_embedding_neardup",
    "x08_langid", "x09_text_quality", "x10_token_counts",
    "x11_fingerprint", "x12_rolling_hash", "x13_multimodal_meta",
    "x17_multimodal_topk", "x18_frame_sample", "x20_cosine_ivf",
    "x20i_ivf_int", "x21_langid_ngram", "x22_dup_clusters",
    "x23_tfidf_terms", "x26_curation_pipeline", "x28_dup_clusters_lsh",
    "x30_langid_pretrained", "x31_char_jaccard", "x36_decontaminate",
    "x37_pack_sequences", "x38_pii_redact", "x39_repetition",
    "x41_corpus_build", "x42_domain_mix", "x43_pack_spans",
    "x44_incremental_curation", "x45_token_mix", "x46_corpus_stats",
    "x48_frame_dedup", "x50_quality_classifier", "x53_semantic_dedup",
    "x54_shuffle_shard", "x55_domain_cap", "x56_semantic_dedup_hier",
    "x57_embed_neardup_reps", "x58_prod_twin_drift",
    "x59_semantic_dedup_auto", "x60_paragraph_dedup",
    "x61_dupgram_profile", "x62_boilerplate_rm", "x63_knn_graph",
    "x64_bloom_decontaminate", "x65_knn_communities", "x66_split_assign",
    "x67_jl_topk")

  test("documents/embeddings catalog entries are total on empty tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_docs_").toString
    Seq("documents", "embeddings").foreach { t =>
      Tables.table(spark, sfDir, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = docFamily.flatMap { q =>
      try { SparkEntry.queries(q)(spark, dir).count(); None }
      catch { case e: Throwable => Some(q -> e.toString.linesIterator.next()) }
    }
    spark.catalog.clearCache()
    assert(failures.isEmpty,
      failures.map { case (q, e) => s"$q: $e" }.mkString("\n"))
  }
}
