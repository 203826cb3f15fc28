package graft.golden

import org.apache.spark.sql.SparkSession

/**
 * Golden-fixture generator: computes every SequentialTwin oracle over one
 * sf directory and writes each as a single-file parquet under
 * `<outDir>/<queryName>.parquet/` — the files SparkEntry.oracleSql points
 * DuckDB at (via the __SF__ token Verify substitutes).
 *
 * All query RESULTS here come from the sequential twins (plain driver-side
 * Scala; NaiveKernel dense math); Spark is used only to read the input
 * parquet, to build the deterministic model registry (the same model
 * fixture both pipelines consume), and to serialize the twin output.
 *
 * Usage: GoldenGen <sfDir> <outDir>   (run once per sf; output committed)
 */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import SequentialTwin._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source")
      .as[(Long, String, String, String)].collect().sortBy(_._1)
      .map { case (id, t, l, s) => Doc(id, t, l, s) }.toSeq
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1).toSeq

    def write[T <: Product : org.apache.spark.sql.Encoder](name: String, rows: Seq[T], cols: String*): Unit = {
      val ds = spark.createDataset(rows)
      val df = if (cols.nonEmpty) ds.toDF(cols: _*) else ds.toDF()
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[golden] $name: ${rows.size} rows")
    }

    // hash-family + scalar ops (documents/embeddings only)
    write("q28_simhash", docs.map(d => (d.docId, simhash(d.text))), "doc_id", "simhash")
    write("q29_simhash_neardup", q29SimhashNearDup(docs), "doc1", "doc2", "hamming")
    write("q32_embedding_neardup", q32EmbeddingNearDup(vecs, threshold = 0.4), "v1", "v2", "cosine")
    write("q33_fingerprint", q33Fingerprints(docs), "doc_id", "fingerprint")
    write("q35_frame_sample", q35FrameSamples(docs), "doc_id", "n_sampled")
    write("q41_sentences", q41Sentences(docs), "url", "sentIdx", "n_tokens")
    write("q36_dedup_clusters", q36DedupClusters(docs), "doc_id", "keep_id")
    write("q49_media_resize", q49Resize(docs))
    write("q34_multimodal_meta", q34MultimodalMeta(docs), "doc_id", "media_type", "n_bytes")
    write("q174_audio_meta", q174AudioMeta(docs),
      "doc_id", "sample_rate", "channels", "n_frames", "n_bytes")
    write("q175_video_frame_hashes", q175VideoFrameHashes(docs),
      "doc_id", "frame_idx", "ahash")
    write("q176_video_neardup", q176VideoNearDup(docs),
      "doc1", "doc2", "matched1", "matched2", "n1", "n2")
    write("q51_sequence_packing", q51Pack(docs, budget = 512L),
      "doc_id", "n_tokens", "bucket", "pack_id")
    write("q38_hash_sample", q38HashSample(docs, pctKeep = 37).map(Tuple1(_)), "doc_id")
    write("q54_mixture_sample",
      q54MixtureSample(docs, Map("src0" -> 100, "src1" -> 80, "src2" -> 55, "src3" -> 30),
        defaultPct = 10),
      "doc_id", "source")
    write("q60_bpe_merges", q60BpeMerges(docs, numMerges = 20),
      "rank", "left", "right", "freq")
    write("q61_bpe_segment", q61BpeSegment(docs, numMerges = 20),
      "doc_id", "n_tokens", "n_subwords", "subword_str")
    write("q64_bpe_segment_2k", q64BpeSegment2k(docs),
      "doc_id", "n_tokens", "n_subwords", "subword_str")
    write("q65_packing_subwords", q65PackBySubwords(docs),
      "doc_id", "n_tokens", "bucket", "pack_id")
    write("q66_ann_ivf_trained", q66IvfTrained(vecs),
      "query_id", "neighbor_id", "rank")
    write("q173_ann_ivf_pq", q173IvfPqTopK(vecs),
      "query_id", "neighbor_id", "rank")
    write("q196_ann_ivf_pq_residual", q196IvfPqResidual(vecs),
      "query_id", "neighbor_id", "rank")
    write("q198_f2_sketch", q198F2Profile(docs),
      "group", "n_rows", "exact_f2", "est_f2", "err_permille")
    write("q199_compression_ratio", q199CompressionProfile(docs),
      "doc_id", "n_bytes", "deflate_len", "ratio_permille", "keep")
    write("q78_ann_pq", q78PqTopK(vecs),
      "query_id", "neighbor_id", "rank")
    write("q67_semdedup", q67SemDedup(vecs), "vec_id", "group_id", "keep")
    write("q68_paragraph_dedup", q68ParagraphDedup(docs),
      "doc_id", "n_paras", "n_dropped", "text_clean")
    write("q76_bloom_dedup", q76BloomDedup(docs),
      "doc_id", "n_paras", "n_dropped", "text_clean")
    write("q77_quality_classifier", q77QualityClassifier(docs),
      "doc_id", "n_grams", "logit", "keep")
    write("q69_dsir_select", q69Dsir(docs), "doc_id", "log_w", "rank")
    write("q70_bpe_encode", q70BpeEncode(docs), "doc_id", "n_subwords", "ids_str")
    write("q71_packed_ids", q71PackedIds(docs),
      "bucket", "pack_id", "n_docs", "n_subwords", "ids_str")
    write("q74_temperature_mixture",
      q74TemperatureMixture(docs.map(d =>
        if (d.docId % 4 == 0) d else d.copy(source = "web"))),
      "doc_id", "source", "pct")
    write("q63_remove_dup_spans", q63RemoveDupSpans(docs, k = 10),
      "doc_id", "n_tokens", "n_removed", "text_clean")
    write("q81_distinct_sketch", q81DistinctSketch(docs),
      "group", "n_rows", "est_distinct", "n_kept", "kth_hash")

    write("q183_count_min", q183CountMin(docs), "token", "cnt", "cm_est")

    // NER pipeline twins (NaiveKernel; one BiLSTM pass, both decoders)
    val models = graft.Pipeline.models(spark, sfDir)
    val (greedy, vit) = tagBoth(docs, models)
    val dict = aliasDict(docs)
    val canon = new Canon(dict)
    write("q42_mentions", mentions(greedy))
    write("q43_tagged_tokens", q43TagCounts(greedy), "lang", "pred", "n")
    write("q44_linked", q44Linked(greedy, dict))
    write("q46_canon_components", Seq((canon.nNodes, canon.nComponents)), "n_nodes", "n_components")
    val trip = q47Triples(greedy, dict, canon)
    write("q47_triples", trip)
    write("q151_coherent_linking", q151CoherentLinking(greedy, dict, canon),
      "url", "lang", "sentIdx", "begin", "surface", "entity_id", "prior",
      "coherence")
    write("q160_char_cosine_rerank",
      q160CharCosineRerank(greedy, dict, models(models.keys.min)),
      "q", "c", "cosine")
    write("q165_trussness", q165Trussness(greedy, dict, canon),
      "a", "b", "trussness")
    write("q170_image_phash", q170ImageHashes(docs), "doc_id", "ahash")
    write("q171_weighted_pagerank", q171WeightedPagerank(trip), "id", "rank")
    write("q79_pagerank", q79PageRank(trip), "id", "rank")
    write("q82_ppr_salience", q82PersonalizedPagerank(trip), "id", "rank")
    write("q94_negative_samples", q94NegativeSamples(trip),
      "subj", "pred", "obj", "slot", "neg_obj")
    write("q95_coreness", q95Coreness(trip), "id", "coreness")
    write("q99_random_walks", q99RandomWalks(trip),
      "start", "walk", "step", "node")
    write("q100_lpa_communities", q100LabelPropagation(trip), "id", "label")
    write("q107_node2vec_walks", q107Node2vecWalks(trip),
      "start", "walk", "step", "node")
    write("q109_link_split", q109LinkSplit(trip), "subj", "pred", "obj", "split")
    write("q110_wl_colors", q110WlColors(trip), "id", "color")
    write("q115_graph_digest", q115GraphDigest(trip),
      "component", "n_nodes", "digest")
    write("q118_hits", q118Hits(trip), "id", "hub", "authority")
    write("q177_msf", q177Msf(trip), "a", "b", "w")
    // q179/q180 run on the rare-predicate hierarchy slice (the q89
    // convention) — the full co-mention graph is a near-clique, where
    // MIS degenerates to one node and coloring to |V| colors
    write("q179_mis", q179Mis(trip.filter(_.pred != "related_to")),
      "id", "round")
    write("q184_densest", q184Densest(trip.filter(_.pred != "related_to")),
      "id", "v_cnt", "e_cnt")
    write("q180_coloring", q180Coloring(trip.filter(_.pred != "related_to")),
      "id", "color")
    write("q187_temporal_reach", q187TemporalReach(trip), "id", "arrival")
    write("q188_corpus_overlap", q188CorpusOverlap(docs),
      "g1", "g2", "est_g1", "est_g2", "est_union", "union_kept",
      "n_common", "jaccard_permille", "est_intersection")
    write("q111_sampled_neighbors", q111SampleNeighbors(trip),
      "root", "hop", "src", "dst")
    write("q48_span_metrics_greedy_vs_viterbi", q48Prf(mentions(vit), mentions(greedy)),
      "entityType", "correct", "guessed", "gold", "precision", "recall", "f1")

    spark.stop()
  }
}
