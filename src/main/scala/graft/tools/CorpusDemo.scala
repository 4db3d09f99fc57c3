package graft.tools

import graft.{GraftSession, SparkEntry}

/** Drives the LLM training-data lane end-to-end over the `documents` /
  * `embeddings` tables — the corpus counterpart of [[PipelineDemo]]'s
  * kayvee drive. Each stage IS a declared query (`SparkEntry.queries`),
  * so the demo exercises exactly what the correctness gate checks, in the
  * order a corpus-preparation pipeline composes them:
  *
  *   hygiene:    corpus_filter → pii_scrub → decontaminate
  *   modalities: audio/video/image stats → keep/drop filters (the
  *               content-quality sweep across all four lanes)
  *   dedup:      exact → minhash pairs → substring spans → span scrub
  *               → multimodal re-wraps → perceptual (dHash) image twins
  *   mixing:     corpus_mix → pack_sequences → shuffle_order
  *   similarity: brute-force top-k → PQ shortlist+rerank recall
  *
  * Usage: `sbt "runMain graft.tools.CorpusDemo [sfDir] [rowsToShow]"`
  */
object CorpusDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val show = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local("graft-corpus-demo")

    val stages = Seq(
      ("q_corpus_filter", "quality gate: keep/drop verdicts with first-failing-rule reasons"),
      ("q_pii_scrub", "PII redaction: email/IPv4 extract-count + md5-pinned rewrite"),
      ("q_decontaminate", "benchmark leak detection vs broadcast eval shingle index"),
      ("q_audio_filter", "audio keep/drop: duration/clipping/silence/level off PCM stats"),
      ("q_video_filter", "video keep/drop: exposure/static-scene cuts off DIB frame stats"),
      ("q_image_filter", "image keep/drop: exposure/contrast/flatness off BMP pixel stats"),
      ("q_dedup_exact", "exact dedup: distinct value tuples"),
      ("q_dedup_minhash", "fuzzy dedup: MinHash+LSH banded candidate pairs"),
      ("q_dedup_substring", "exact substring dedup: shared 20-token spans w/ positions"),
      ("q_dedup_substring_scrub", "span removal: shared windows excised from non-keepers"),
      ("q_multimodal_dedup", "multimodal near-dup: re-wrapped containers by parsed-frame hash"),
      ("q_dedup_phash", "perceptual image near-dup: brightness-shifted twins by dHash bands"),
      ("q_domain_stats", "per-domain curation table: volume, quality, clamped keep_ppm"),
      ("q_cluster_stats", "dup-cluster size report: histogram + singleton row"),
      ("q_corpus_mix", "language re-weighting: data-derived quotas"),
      ("q_corpus_mix_temperature", "temperature-flattened quotas: share^0.75, capped"),
      ("q_importance_resample", "DSIR selection: hashed-ngram importance weights, Gumbel top-k"),
      ("q_pack_sequences", "context-window packing: token-budget bins per language"),
      ("q_tokenize_pack", "packing against TRAINED token counts: achieved fill ppm"),
      ("q_shuffle_order", "reproducible training-order shuffle"),
      ("q_similarity_topk", "exact embedding top-k (two-phase)"),
      ("q_ann_recall_pq_rerank", "PQ shortlist + exact rerank: the L→recall curve"),
      // ops diagnostics around the corpus run (lineitem/events tables)
      ("q_skew_profile", "pre-join skew report: hot-key ppm shares + skew factor"),
      ("q_join_salted_auto", "measured-skew adaptive salted join (oracle: plain join)"),
      ("q_compact_plan", "small-file compaction plan: prefix-sum first-fit bins"),
      ("q_bin_equidepth", "equi-depth deciles without a global sort")
    )

    stages.foreach { case (name, what) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      println(s"== $name — $what")
      println(s"   rows: $n")
      df.show(show, truncate = 60)
      graft.Bench.cleanup(spark)
    }
    spark.stop()
  }
}
