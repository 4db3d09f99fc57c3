package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import QueryDef.q

/** Corpus-hygiene operators a training-data pipeline runs before any
  * tokenization: benchmark decontamination and PII scrubbing. The
  * reference has no such operators (engine-native ★ extensions per
  * SURVEY.md §2.1); the test corpus plants what each must find.
  */
object PipelineQueries {

  /** Eval membership: every 97th document stands in for a benchmark set
    * (~1 % of the corpus — realistic benchmark-to-corpus ratio). */
  private val evalMod = 97

  /** Fixed selection budget for the pipeline's DSIR resample stage —
    * production importance resampling selects a BUDGET (Xie et al. 2023
    * pick a target token count), not a corpus fraction, and a fixed k is
    * what keeps the selection a TakeOrderedAndProject instead of a
    * global sort. 256 sits between the fixtures: the sf0.001/sf0.01
    * survivor sets are smaller (the stage is an exact pass-through —
    * rank <= k keeps every doc, in both engines) while sf0.1's is
    * larger, so the tri-SF gate exercises both arms. */
  private val dsirPipelineBudget = 256

  // Deterministic PII injected into every document (and into the oracle
  // identically) so the scrubber always has something to find on top of
  // whatever occurs naturally.
  private val emailPat = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val ipPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Distinct word-8-grams, imperatively: the declarative HOF shape
    * (transform + 8 element_ats + concat_ws per shingle) evaluates
    * interpreted and measured ~8 s at sf0.1; this per-partition loop is
    * the codebase's sanctioned row-imperative lane (~4×). Per-doc dedup
    * via HashSet ≡ array_distinct, so pairs come out unique. Shared by
    * q_decontaminate and the q_corpus_pipeline decontamination stage. */
  private def grams8(s: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import s.implicits._
    df.as[(Long, String)].flatMap { case (id, text) =>
      val tok = text.split(' ')
      if (tok.length < 8) Iterator.empty
      else {
        val seen = new java.util.HashSet[String]((tok.length - 7) * 2)
        (0 to tok.length - 8).iterator.map { i =>
          val sb = new java.lang.StringBuilder(64)
          var j = 0
          while (j < 8) { if (j > 0) sb.append(' '); sb.append(tok(i + j)); j += 1 }
          sb.toString
        }.filter(seen.add).map(sh => (id, sh))
      }
    }.toDF(idCol, "s")
  }

  /** Width-1 band count for fuzzy decontamination. Raised 8 -> 16 in
    * round 15 off the measured recall curve (docs/SCALING.md): at the
    * planted leaks' exact-jac floor (~0.27), P(candidate) = 1-(1-j)^H is
    * 0.92 at H=8 vs 0.995 at H=16, and measured recall went 47/54 ->
    * 54/54 at sf0.1 (6/6 at both smaller SFs) for ~2x a still-tiny
    * candidate set — the recall-asymmetric provisioning argument made
    * quantitative (a missed leak silently poisons evals; a false
    * candidate costs one bounded verify). */
  private[graft] val fuzzyDecontHashes = 16

  /** q_decontaminate_fuzzy's oracle: the q_dedup_minhash CTE chain with
    * cross-set sides (train vs eval), width-1 bands, and the shared
    * floor-first Jaccard rounding. */
  private lazy val fuzzyDecontSql: String = {
    def sh3(src: String) =
      s"""SELECT doc_id, unnest(list_distinct(list_transform(
         |    generate_series(1, len(l) - 2), i -> l[i] || '_' || l[i+1] || '_' || l[i+2]))) AS s
         |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM $src)""".stripMargin
    def bands1(shCte: String) =
      s"""SELECT doc_id, j AS b, min(md5(j || '#' || s)) AS bv
         |  FROM $shCte CROSS JOIN (SELECT unnest(generate_series(0, ${fuzzyDecontHashes - 1})) AS j) g
         |  GROUP BY doc_id, j""".stripMargin
    s"""WITH ev AS (SELECT doc_id, text FROM documents WHERE doc_id % $evalMod = 0),
       |tr AS (SELECT doc_id, text FROM documents WHERE doc_id % $evalMod <> 0
       |  UNION ALL
       |  SELECT doc_id + 3000000,
       |    array_to_string(list_filter(string_split(text, ' '), (x, i) -> i % 5 != 1), ' ')
       |  FROM documents WHERE doc_id % $evalMod = 0),
       |evsh AS (${sh3("ev")}),
       |trsh AS (${sh3("tr")}),
       |evc AS (SELECT doc_id, count(*) AS n FROM evsh GROUP BY doc_id),
       |trc AS (SELECT doc_id, count(*) AS n FROM trsh GROUP BY doc_id),
       |evbands AS (${bands1("evsh")}),
       |trbands AS (${bands1("trsh")}),
       |cands AS (SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
       |  FROM trbands t JOIN evbands e ON t.b = e.b AND t.bv = e.bv),
       |pairs AS (SELECT c.train_id, c.eval_id, count(*) AS inter
       |  FROM cands c JOIN trsh x ON x.doc_id = c.train_id
       |  JOIN evsh y ON y.doc_id = c.eval_id AND y.s = x.s
       |  GROUP BY 1, 2)
       |SELECT train_id, eval_id, ${CrossRound.sql("jac", 4)} AS jac FROM (
       |  SELECT p.train_id, p.eval_id, p.inter::DOUBLE / (a.n + b.n - p.inter) AS jac
       |  FROM pairs p JOIN trc a ON p.train_id = a.doc_id JOIN evc b ON p.eval_id = b.doc_id)
       |WHERE jac >= 0.2""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // ★ Benchmark decontamination: find training documents that leak eval
    // content — ≥1 shared word-8-gram with any eval doc. The corpus
    // plants the leaks: a mutated copy (every 13th token dropped) of each
    // eval doc joins the training side, leaving runs of 12 unbroken
    // tokens → plenty of shared 8-grams. Scale design: the eval side is
    // the tiny fixed set (benchmarks are thousands of docs at any corpus
    // size) → BROADCAST its exploded shingle index; the training side
    // streams by it with no shuffle of the big side.
    q(
      "q_decontaminate",
      s"""WITH ev AS (
         |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
         |  WHERE doc_id % $evalMod = 0),
         |train AS (
         |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
         |  WHERE doc_id % $evalMod <> 0
         |  UNION ALL
         |  SELECT doc_id + 2000000,
         |    list_filter(string_split(text, ' '), (x, i) -> i % 13 != 1)
         |  FROM documents WHERE doc_id % $evalMod = 0),
         |evs AS (
         |  SELECT DISTINCT doc_id AS eval_id, unnest(list_distinct(list_transform(
         |    generate_series(1, len(l) - 7),
         |    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' ||
         |         l[i+4] || ' ' || l[i+5] || ' ' || l[i+6] || ' ' || l[i+7]))) AS s
         |  FROM ev),
         |trs AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    generate_series(1, len(l) - 7),
         |    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' ||
         |         l[i+4] || ' ' || l[i+5] || ' ' || l[i+6] || ' ' || l[i+7]))) AS s
         |  FROM train)
         |SELECT t.doc_id, count(DISTINCT t.s) AS n_shared,
         |  count(DISTINCT e.eval_id) AS n_eval_docs
         |FROM trs t JOIN evs e ON t.s = e.s
         |GROUP BY t.doc_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir).documents
      val evalShingles = grams8(s,
        d.filter(col("doc_id") % evalMod === 0).select(col("doc_id"), col("text")), "eval_id")
      val train = d.filter(col("doc_id") % evalMod =!= 0)
        .select(col("doc_id"), col("text"))
        .unionByName(
          d.filter(col("doc_id") % evalMod === 0).select(
            (col("doc_id") + 2000000L).as("doc_id"),
            concat_ws(" ", filter(split(col("text"), " "), (_, i) => i % 13 =!= 0)).as("text")
          ))
      grams8(s, train, "doc_id")
        .join(broadcast(evalShingles), "s") // eval index is the small fixed side
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("s")).as("n_shared"),
          countDistinct(col("eval_id")).as("n_eval_docs"))
    },

    // ★ Cross-document n-gram novelty — the boilerplate signal that is
    // NOT q_quality_repetition (within-doc repeats) and NOT dedup
    // (whole-doc similarity): per document, what fraction of its distinct
    // word-8-grams appears in NO other document. Low novelty flags
    // template/boilerplate content (headers, licenses, navigation) that
    // survives both dedup (docs differ overall) and repetition scoring
    // (the boilerplate occurs once per doc) — the Gopher-style curation
    // signal between the two. On this corpus ~5% of 8-grams are shared
    // (df up to 4, measured), so the score separates naturally. Shape:
    // the shared grams8 per-partition shingler (one pass), one exchange
    // to df-count grams, one exchange back to per-doc ratios — the TF-IDF
    // cost envelope, O(corpus tokens) with no pairwise work. Docs under 8
    // tokens emit no row in both engines (empty gram set).
    q(
      "q_ngram_novelty",
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    generate_series(1, len(l) - 7),
         |    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' ||
         |         l[i+4] || ' ' || l[i+5] || ' ' || l[i+6] || ' ' || l[i+7]))) AS s
         |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)),
         |df AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
         |SELECT g.doc_id, count(*)::BIGINT AS n_grams,
         |  count(*) FILTER (d.df = 1)::BIGINT AS n_novel,
         |  ${CrossRound.sql("count(*) FILTER (d.df = 1)::DOUBLE / count(*)", 4)} AS novelty
         |FROM sh g JOIN df d ON g.s = d.s
         |GROUP BY g.doc_id""".stripMargin
    ) { (s, dir) =>
      val g = grams8(s,
        Tables(s, dir).documents.select(col("doc_id"), col("text")), "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dfC = g.groupBy(col("s")).agg(count(lit(1)).as("df"))
      g.join(dfC, "s")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          CrossRound.col(col("n_novel").cast("double") / col("n_grams"), 4).as("novelty"))
    },

    // ★ FUZZY benchmark decontamination — the near-duplicate leak the
    // exact-8-gram arm structurally cannot see: a paraphrase-level copy
    // (here: every 5th token dropped, so the longest unbroken run is 4
    // tokens and NO word-8-gram survives — the planted set provably
    // defeats q_decontaminate) still shares ~30% of its word-3-gram
    // shingles with its eval source. Pipeline: 3-gram shingles both
    // sides, 16 min-hashes (round 15: raised from 8 off the measured
    // recall curve — see fuzzyDecontHashes), and WIDTH-1 LSH bands —
    // decontamination is recall-asymmetric (a missed leak silently
    // poisons every eval score downstream, a false candidate costs one
    // bounded verify), so the banding is provisioned at r=1:
    // P(candidate) = 1-(1-j)^16 ≈ 0.995 at the planted leaks' jac floor
    // (~0.27) vs 0.31 for the dedup family's 4×2 bands. Candidates
    // verify by exact Jaccard ≥ 0.2 (shared jaccardVerifyAcross — the
    // formula, rounding, and threshold semantics cannot drift from the
    // dedup lanes). Measured on the planted leaks: 6/6 caught at
    // sf0.001 AND sf0.01, 54/54 ≥ 0.2 truth pairs at sf0.1 (H=8 missed
    // 7 of those — the measured analytic banding-miss rate; curve in
    // docs/SCALING.md), pinned in FuzzyDecontSpec with the exact arm's
    // structural zero.
    // Scale: the eval side is the tiny fixed set at any corpus size →
    // its width-1 band index BROADCASTS; the train side streams by it
    // (no shuffle of the big side); verify touches candidate pairs only.
    q(
      "q_decontaminate_fuzzy",
      fuzzyDecontSql
    ) { (s, dir) =>
      val d = Tables(s, dir).documents.select(col("doc_id"), col("lang"), col("text"))
      val ev = d.filter(col("doc_id") % evalMod === 0)
      val train = d.filter(col("doc_id") % evalMod =!= 0)
        .unionByName(ev.select(
          (col("doc_id") + 3000000L).as("doc_id"), col("lang"),
          concat_ws(" ", filter(split(col("text"), " "), (_, i) => i % 5 =!= 0)).as("text")))
      // both shingle frames feed two consumers (bands + verify) — persist
      val evSarr = DedupQueries.shingleArrays(ev)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val trSarr = DedupQueries.shingleArrays(train)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // width-1 bands: each of the 8 min-hashes is its own blocking key
      def bands1(sarr: DataFrame, id: String): DataFrame = sarr
        .select(col("doc_id").as(id),
          graft.plans.OptimizerBarrier.once(
            graft.functions.TextHashExpressions.minHash(col("sarr"), fuzzyDecontHashes)).as("hs"))
        .filter(col("hs").isNotNull)
        .select(col(id), explode(array((0 until fuzzyDecontHashes).map(j =>
          struct(lit(j).as("b"), element_at(col("hs"), j + 1).as("bv"))): _*)).as("band"))
        .select(col(id), col("band.b").as("b"), col("band.bv").as("bv"))
      val cands = bands1(trSarr, "train_id")
        .join(broadcast(bands1(evSarr, "eval_id")), Seq("b", "bv"))
        .select(col("train_id"), col("eval_id")).distinct()
      DedupQueries.jaccardVerifyAcross(
          trSarr.select(col("doc_id").as("doc_a"), col("sarr").as("sa")),
          evSarr.select(col("doc_id").as("doc_b"), col("sarr").as("sb")),
          cands.select(col("train_id").as("doc_a"), col("eval_id").as("doc_b")),
          0.2)
        .select(col("doc_a").as("train_id"), col("doc_b").as("eval_id"), col("jac"))
    },

    // ★ End-to-end corpus pipeline — the product story in ONE declared,
    // oracle-checked query: ingest (documents + planted near-dup variants)
    // → composite filter → exact dedup (keep-first) → MinHash-LSH near-dup
    // dedup (signature→bucket→verify, greedy keep-lowest-id) →
    // benchmark decontamination (shared word-8-gram vs the eval slice) →
    // DSIR importance resample (round 18: Gumbel top-k at the fixed
    // dsirPipelineBudget toward the lang='en' target — pass-through
    // below the budget) → data-derived corpus mix (cap every language at
    // 2× the smallest) → sequence packing (2048-token bins per
    // language). Every stage is a declared lane elsewhere
    // (q_corpus_filter, q_dedup_keep_first, q_dedup_minhash,
    // q_decontaminate, q_importance_resample, q_corpus_mix,
    // q_pack_sequences); this proves they COMPOSE under one optimizer
    // pass — the place where operator-fusion regressions would hide.
    //
    // Scale design: the documents parquet is read ONCE into a persisted
    // base frame (plan-guarded: every scan in the plan sits behind the
    // cache); the variant corpus is built by a per-row explode, not a
    // second scan; each multi-consumer stage output (exact-dedup
    // survivors, shingle arrays, near-dup survivors, decontaminated set)
    // is persisted exactly like the standalone lanes do — at 100 TB these
    // become checkpointed stage tables, which is how a production corpus
    // run materializes anyway. The only quadratic work is the per-bucket
    // posting-pair emission the LSH bound (Σ df²); the eval 8-gram index
    // broadcasts (benchmarks stay thousands of docs at any corpus size);
    // the mix quota is |langs| rows; packing windows shard by language.
    q(
      "q_corpus_pipeline",
      s"""WITH ${DedupQueries.canonicalCtes("documents")},
         |c0 AS (
         |  SELECT d.doc_id, d.lang, d.text FROM documents d
         |  JOIN uranked u ON u.doc_id = d.doc_id AND u.keep),
         |corpus AS (
         |  SELECT doc_id, lang, text FROM c0
         |  UNION ALL
         |  SELECT doc_id + 1000000, lang,
         |    array_to_string(list_filter(string_split(text, ' '), (x, i) -> i % 7 != 1), ' ')
         |  FROM c0),
         |f AS (
         |  SELECT doc_id, lang, text, len(l)::BIGINT AS n_tokens
         |  FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS l FROM corpus)
         |  WHERE len(l) >= 20 AND len(list_distinct(l))::DOUBLE / len(l) >= 0.3),
         |e AS (
         |  SELECT doc_id, lang, text, n_tokens FROM (
         |    SELECT f.*, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM f) WHERE rn = 1),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    generate_series(1, len(l) - 2), i -> l[i] || '_' || l[i+1] || '_' || l[i+2]))) AS s
         |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM e)),
         |sc AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |${DedupQueries.minhashCandsCtes},
         |pairs AS (
         |  SELECT c.doc_a, c.doc_b, count(*) AS inter
         |  FROM cands c JOIN sh x ON x.doc_id = c.doc_a
         |               JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
         |  GROUP BY 1, 2),
         |drops AS (
         |  SELECT DISTINCT p.doc_b AS doc_id
         |  FROM pairs p JOIN sc x ON p.doc_a = x.doc_id JOIN sc y ON p.doc_b = y.doc_id
         |  WHERE p.inter::DOUBLE / (x.n + y.n - p.inter) >= 0.3),
         |m AS (SELECT * FROM e WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
         |evs AS (
         |  SELECT DISTINCT unnest(list_distinct(list_transform(
         |    generate_series(1, len(l) - 7),
         |    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' ||
         |         l[i+4] || ' ' || l[i+5] || ' ' || l[i+6] || ' ' || l[i+7]))) AS s
         |  FROM (SELECT string_split(text, ' ') AS l FROM documents
         |        WHERE doc_id % $evalMod = 0)),
         |contaminated AS (
         |  SELECT DISTINCT t.doc_id FROM (
         |    SELECT doc_id, unnest(list_distinct(list_transform(
         |      generate_series(1, len(l) - 7),
         |      i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' ||
         |           l[i+4] || ' ' || l[i+5] || ' ' || l[i+6] || ' ' || l[i+7]))) AS s
         |    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM m)) t
         |  JOIN evs ev ON t.s = ev.s),
         |d AS (
         |  SELECT * FROM m WHERE doc_id % $evalMod <> 0
         |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |${dsirCtes("d", "r")},
         |rsel AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (
         |      ORDER BY floor(key * 1e6) / 1e6 DESC, doc_id) AS rrn
         |    FROM rkeyed) WHERE rrn <= $dsirPipelineBudget),
         |d2 AS (SELECT d.* FROM d JOIN rsel USING (doc_id)),
         |counts AS (SELECT lang, count(*)::BIGINT AS n FROM d2 GROUP BY lang),
         |quota AS (SELECT lang, least(n, 2 * (SELECT min(n) FROM counts)) AS cap FROM counts),
         |ranked AS (
         |  SELECT doc_id, lang, n_tokens,
         |    row_number() OVER (PARTITION BY lang ORDER BY md5('mix42#' || doc_id)) AS rk
         |  FROM d2),
         |mixed AS (
         |  SELECT r.doc_id, r.lang, r.n_tokens FROM ranked r
         |  JOIN quota q ON r.lang = q.lang WHERE r.rk <= q.cap),
         |c AS (
         |  SELECT doc_id, lang, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |                        ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM mixed)
         |SELECT doc_id, lang, n_tokens, ((cum - n_tokens) // 2048)::BIGINT AS bin
         |FROM c""".stripMargin
    ) { (s, dir) => corpusPipelineStages(s, dir)._3 },

    // ★ Composite corpus filter: the keep/drop decision layer a training
    // pipeline runs over its cheap per-doc signals — first failing rule
    // wins, and the reason column makes the drop auditable (the shape
    // every curation run needs for its retention report). Pure per-row
    // array math, no shuffle at any scale.
    q(
      "q_corpus_filter",
      """SELECT doc_id,
        |  CASE WHEN n_tokens < 20 THEN 'drop' WHEN uniq_ratio < 0.3 THEN 'drop'
        |       ELSE 'keep' END AS verdict,
        |  CASE WHEN n_tokens < 20 THEN 'too_short'
        |       WHEN uniq_ratio < 0.3 THEN 'low_diversity' ELSE '' END AS reason
        |FROM (
        |  SELECT doc_id, len(l) AS n_tokens,
        |    len(list_distinct(l))::DOUBLE / len(l) AS uniq_ratio
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))""".stripMargin
    ) { (s, dir) =>
      val base = Tables(s, dir).documents
        .withColumn("l", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("l")).as("n_tokens"),
          (size(array_distinct(col("l"))).cast("double") / size(col("l"))).as("uniq_ratio"))
      base.select(
        col("doc_id"),
        when(col("n_tokens") < 20, "drop")
          .when(col("uniq_ratio") < 0.3, "drop").otherwise("keep").as("verdict"),
        when(col("n_tokens") < 20, "too_short")
          .when(col("uniq_ratio") < 0.3, "low_diversity").otherwise("").as("reason"))
    },

    // ★ Per-domain curation rollup — the C4/Gopher-style decision table a
    // web corpus computes before sampling: for every source domain, doc
    // and token volume, language spread, mean quality (the
    // q_quality_score formula, carried as ×10000 integer fixed point so
    // the aggregation is a commutative integer sum — cross-engine exact
    // regardless of combine order), low-quality fraction in ppm, and a
    // keep_ppm sampling rate = min(quality-proportional rate, corpus-cap
    // rate) that downsamples low-quality domains AND caps any single
    // domain at 25% of the corpus. Plan: ONE documents scan → per-row
    // array features → one hash agg keyed by source (map-side partials) →
    // a 1-row total broadcast back over the O(domains) rollup. At 100 TB
    // the rollup is O(domains) rows — the decision table stays
    // driver-readable no matter the corpus size, which is the point.
    q(
      "q_domain_stats",
      s"""WITH f AS (
        |  SELECT source, lang, len(l) AS n_tokens,
        |    CAST(round(10000 * ${CrossRound.sql(
          "0.4 * least(len(l) / 100.0, 1.0)" +
            " + 0.4 * (len(list_distinct(l))::DOUBLE / len(l))" +
            " + 0.2 * least((list_sum(list_transform(l, x -> length(x)))::DOUBLE / len(l)) / 8.0, 1.0)",
          4)}) AS BIGINT) AS sc
        |  FROM (SELECT source, lang, string_split(text, ' ') AS l FROM documents)),
        |s AS (
        |  SELECT source, count(*) AS n_docs, sum(n_tokens)::BIGINT AS n_tokens,
        |    count(DISTINCT lang) AS n_langs, sum(sc)::BIGINT AS sc_sum,
        |    sum(CASE WHEN sc < 5000 THEN 1 ELSE 0 END)::BIGINT AS n_low
        |  FROM f GROUP BY 1),
        |g AS (SELECT sum(n_docs)::BIGINT AS total FROM s)
        |SELECT source, n_docs, n_tokens, n_langs,
        |  sc_sum // n_docs AS mean_score_x10000,
        |  (n_low * 1000000) // n_docs AS low_ppm,
        |  least((sc_sum // n_docs) * 100,
        |        least((g.total // 4) * 1000000 // n_docs, 1000000)) AS keep_ppm
        |FROM s CROSS JOIN g""".stripMargin
    ) { (s, dir) =>
      val f = Tables(s, dir).documents
        .withColumn("l", split(col("text"), " "))
        .select(col("source"), col("lang"), size(col("l")).as("n_tokens"),
          // the q_quality_score formula carried as x10000 fixed point —
          // same floor-first rounding as that lane (decimal-half class),
          // so the two scores cannot drift
          round(lit(10000) * CrossRound.col(
            lit(0.4) * least(size(col("l")) / 100.0, lit(1.0)) +
              lit(0.4) * (size(array_distinct(col("l"))).cast("double") / size(col("l"))) +
              lit(0.2) * least(
                (aggregate(transform(col("l"), x => length(x).cast("long")), lit(0L),
                  (a, x) => a + x).cast("double") / size(col("l"))) / 8.0, lit(1.0)),
            4)).cast("long").as("sc"))
      // cached: the O(domains) rollup feeds both the output and the 1-row
      // corpus total — one documents scan, not two (Bench.cleanup
      // unpersists)
      val byDomain = f.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
          countDistinct(col("lang")).as("n_langs"), sum(col("sc")).as("sc_sum"),
          sum(when(col("sc") < 5000, 1L).otherwise(0L)).as("n_low"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val g = byDomain.agg(sum(col("n_docs")).as("total"))
      byDomain.crossJoin(broadcast(g))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("n_langs"),
          expr("sc_sum div n_docs").as("mean_score_x10000"),
          expr("n_low * 1000000 div n_docs").as("low_ppm"),
          least(expr("(sc_sum div n_docs) * 100"),
            least(expr("(total div 4) * 1000000 div n_docs"), lit(1000000L)))
            .as("keep_ppm"))
    },

    // ★ Stratified sampling: per-language keep quotas via a deterministic
    // multiplicative integer hash — the downsample-by-domain step of a
    // corpus mix. Pure integer arithmetic so both engines agree exactly
    // (no float RNG to reconcile); narrow filter, no shuffle, and the
    // same rows are kept at any parallelism or scale.
    q(
      "q_sample_stratified",
      """SELECT doc_id, lang FROM documents
        |WHERE (doc_id * 2654435761) % 100 <
        |  CASE WHEN lang = 'en' THEN 10 ELSE 50 END""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir).documents
        .filter(expr("(doc_id * 2654435761) % 100") <
          when(col("lang") === "en", 10).otherwise(50))
        .select(col("doc_id"), col("lang"))
    },

    // ★ Weighted sampling without replacement — Efraimidis–Spirakis A-ES:
    // top-k documents by u^(1/w) ⟺ top-k by ln(u)/w, here with weight =
    // n_chars so longer documents are proportionally likelier (the
    // standard length-weighted corpus draw). The "uniform" u is derived
    // from the same Knuth multiplicative hash q_sample_stratified seeds
    // with, so the draw is REPRODUCIBLE across reruns and engines — the
    // property a training pipeline needs from its sampler. One pass, one
    // TakeOrderedAndProject (per-partition top-k then a k-row merge);
    // never a global sort. Ordering happens on the floored key with a
    // doc_id tie-break so both engines agree at ulp boundaries.
    q(
      "q_sample_weighted",
      """WITH k AS (
        |  SELECT doc_id, lang, n_chars,
        |    ln(((doc_id * 2654435761) % 1000000 + 0.5) / 1e6)
        |      / greatest(n_chars, 1) AS key
        |  FROM documents)
        |SELECT doc_id, lang, n_chars,
        |  floor(key * 1e9) / 1e9 + 0.0 AS skey
        |FROM k ORDER BY skey DESC, doc_id LIMIT 30""".stripMargin
    ) { (s, dir) =>
      val key = log(((col("doc_id") * lit(2654435761L)) % 1000000 + 0.5) / 1e6) /
        greatest(col("n_chars"), lit(1))
      Tables(s, dir).documents
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (floor(key * 1e9) / 1e9 + 0.0).as("skey"))
        .orderBy(col("skey").desc, col("doc_id"))
        .limit(30)
    },

    // ★ Sequence packing: assign documents to fixed token-budget bins
    // (2048) by a running token sum — the packing step before
    // tokenization. Packed per language PARTITION so the window state
    // shards instead of funneling the corpus through one global-order
    // task (the per-shard packing every distributed pipeline does).
    q(
      "q_pack_sequences",
      """WITH t AS (
        |  SELECT doc_id, lang, len(string_split(text, ' '))::BIGINT AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT doc_id, lang, n_tokens,
        |  ((cum - n_tokens) // 2048)::BIGINT AS bin FROM c""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(
          Window.partitionBy(col("lang")).orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          expr("(cum - n_tokens) div 2048").as("bin"))
    },

    // ★ Deterministic training-order shuffle: every epoch of a training
    // run needs the corpus in a reproducible pseudo-random order. Key each
    // doc by a seeded md5, derive its shard from the first hex digit, and
    // number positions per shard — a global permutation without a global
    // sort: the only ordering work is S independent per-shard windows, so
    // at 100 TB each shard sorts its own slice in parallel (and a writer
    // would emit shard files directly). md5 is the one hash both engines
    // share; hex-string ordering is plain ASCII so both sort identically.
    q(
      "q_shuffle_order",
      """SELECT doc_id, shard, row_number() OVER (PARTITION BY shard ORDER BY h) AS pos
        |FROM (
        |  SELECT doc_id,
        |    ('0x' || substr(md5('shuf42#' || doc_id), 1, 1))::BIGINT % 8 AS shard,
        |    md5('shuf42#' || doc_id) AS h
        |  FROM documents)""".stripMargin
    ) { (s, dir) =>
      val h = md5(concat(lit("shuf42#"), col("doc_id").cast("string")))
      Tables(s, dir).documents
        .select(
          col("doc_id"),
          (conv(substring(h, 1, 1), 16, 10).cast("long") % 8).as("shard"),
          h.as("h"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("h"))).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"))
    },

    // ★ Corpus mixing: rebalance the language mix by capping every
    // language at 2× the smallest language's count — quotas are
    // DATA-DERIVED (unlike q_sample_stratified's fixed rates), so this is
    // the two-pass shape: a tiny per-lang count aggregate, broadcast back,
    // then keep the quota's worth of docs chosen by seeded-hash rank.
    // Scale notes: the quota table is |langs| rows (always broadcast);
    // per-lang ranking shards the sort by language — skewed corpora would
    // swap the window for a hash-threshold cutoff (rank r ≙ r-th smallest
    // hash) found via approx quantile, trading exactness for no sort.
    q(
      "q_corpus_mix",
      """WITH counts AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
        |quota AS (SELECT lang, least(n, 2 * (SELECT min(n) FROM counts)) AS cap FROM counts),
        |ranked AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY md5('mix42#' || doc_id)) AS rk
        |  FROM documents)
        |SELECT r.doc_id, r.lang, r.rk FROM ranked r
        |JOIN quota q ON r.lang = q.lang WHERE r.rk <= q.cap""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir).documents
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val quota = counts
        .crossJoin(broadcast(counts.agg(min(col("n")).as("mn"))))
        .select(col("lang"), least(col("n"), lit(2) * col("mn")).as("cap"))
      val ranked = docs
        .select(col("doc_id"), col("lang"),
          md5(concat(lit("mix42#"), col("doc_id").cast("string"))).as("h"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("h"))).cast("long"))
      ranked
        .join(broadcast(quota), "lang")
        .filter(col("rk") <= col("cap"))
        .select(col("doc_id"), col("lang"), col("rk"))
    },

    // ★ Temperature-flattened corpus mixing — the multilingual sampling
    // rule (select with probability ∝ share^α, α < 1) that keeps
    // low-resource languages from vanishing under proportional sampling:
    // per-language weights n^0.75 in ×1e6 integer fixed point — α=3/4,
    // the canonical multilingual-sampling exponent, chosen over 0.7 so
    // the weight is sqrt(n·sqrt(n)): a composition of IEEE
    // correctly-rounded basic ops (×, sqrt), bit-identical across
    // engines, where libm pow is only ~1-ulp accurate and a weight
    // landing within an ulp of an integer could flip the floor between
    // engines — integer-divided against a
    // half-corpus budget, capped at availability, then the same
    // deterministic md5-rank draw as q_corpus_mix. The quota table is
    // O(langs) and broadcast; the draw is one partitioned rank. The
    // fixture's language distribution is uniform (quotas degenerate to
    // equal) — TemperatureMixSpec proves the flattening property on a
    // planted 10:1 skew: the small language's quota share strictly
    // exceeds its corpus share, the big one's falls. At 100 TB quotas
    // above availability switch to sampling WITH replacement (an
    // explode over ceil(quota/n) copies) — same quota math.
    q(
      "q_corpus_mix_temperature",
      """WITH counts AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
        |w AS (SELECT lang, n, CAST(floor(sqrt(n * sqrt(n)) * 1e6) AS BIGINT) AS wt FROM counts),
        |tot AS (SELECT sum(wt)::BIGINT AS tw, (sum(n) // 2)::BIGINT AS budget FROM w),
        |quota AS (
        |  SELECT lang, least(n, (t.budget * w.wt) // t.tw) AS cap
        |  FROM w CROSS JOIN tot t),
        |ranked AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY md5('mixT#' || doc_id)) AS rk
        |  FROM documents)
        |SELECT r.doc_id, r.lang, r.rk, q.cap AS quota FROM ranked r
        |JOIN quota q ON r.lang = q.lang WHERE r.rk <= q.cap""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir).documents
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val quota = temperatureQuotas(counts, 0.75)
      val ranked = docs
        .select(col("doc_id"), col("lang"),
          md5(concat(lit("mixT#"), col("doc_id").cast("string"))).as("h"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("h"))).cast("long"))
      ranked
        .join(broadcast(quota), "lang")
        .filter(col("rk") <= col("cap"))
        .select(col("doc_id"), col("lang"), col("rk"), col("cap").as("quota"))
    },

    // ★ PII scrub: inject deterministic emails/IPv4s, then extract-count
    // and redact them; md5 of the scrubbed text pins the whole rewritten
    // output, not just the counts. Pure per-row regex work — narrow at
    // any scale. (Patterns kept to the Java∩RE2 regex dialect; DuckDB
    // regexp_replace needs the 'g' flag to replace all occurrences.)
    q(
      "q_pii_scrub",
      s"""WITH aug AS (
         |  SELECT doc_id,
         |    text || ' contact user' || doc_id || '@corp.example.com via 10.' ||
         |      (doc_id % 200) || '.0.' || (doc_id % 250) AS t
         |  FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(t, '$emailPat')) AS n_emails,
         |  len(regexp_extract_all(t, '$ipPat')) AS n_ips,
         |  md5(regexp_replace(regexp_replace(t, '$emailPat', '<EMAIL>', 'g'),
         |      '$ipPat', '<IP>', 'g')) AS scrubbed_fp
         |FROM aug""".stripMargin
    ) { (s, dir) =>
      val t = concat(
        col("text"), lit(" contact user"), col("doc_id"), lit("@corp.example.com via 10."),
        col("doc_id") % 200, lit(".0."), col("doc_id") % 250)
      Tables(s, dir).documents.select(
        col("doc_id"),
        size(regexp_extract_all(t, lit(emailPat), lit(0))).as("n_emails"),
        size(regexp_extract_all(t, lit(ipPat), lit(0))).as("n_ips"),
        md5(regexp_replace(regexp_replace(t, emailPat, "<EMAIL>"), ipPat, "<IP>"))
          .as("scrubbed_fp")
      )
    },

    // ★ Document chunking — the context-window splitter every training
    // pipeline runs before tokenized packing: 64-token chunks at stride
    // 48 (16-token overlap so no boundary n-gram is lost). chunk i covers
    // tokens [i*48, i*48+64); the last chunk may be short. Pure per-row
    // explode — narrow, shuffle-free, linear in corpus tokens at any
    // scale (q_pack_sequences handles the downstream bin packing).
    q(
      "q_chunk_documents",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |c AS (SELECT doc_id,
        |        unnest(generate_series(0, (len(ts) - 1) // 48)) AS chunk_id, ts
        |      FROM toks)
        |SELECT doc_id, chunk_id::INT AS chunk_id,
        |  array_to_string(list_slice(ts, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ') AS chunk_text,
        |  len(list_slice(ts, chunk_id * 48 + 1, chunk_id * 48 + 64))::INT AS n_tokens
        |FROM c""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, (size(ts) - 1) div 48), " +
            "i -> named_struct('chunk_id', i, 'chunk', slice(ts, i * 48 + 1, 64)))"
        )).as("c"))
        .select(
          col("doc_id"),
          col("c.chunk_id").cast("int").as("chunk_id"),
          concat_ws(" ", col("c.chunk")).as("chunk_text"),
          size(col("c.chunk")).cast("int").as("n_tokens")
        )
    },

    // ★ Leakage-free train/val/test split — the hygiene step BETWEEN
    // dedup and training that per-doc splitting silently breaks: if one
    // member of a near-duplicate pair lands in train and the other in
    // test, the benchmark is contaminated by construction. The fix is
    // GROUP-aware assignment: split by the near-dup CLUSTER key (the
    // simhash-verified edge set fed through the same connected-components
    // as q_dedup_cluster; unpaired docs are their own group), so a whole
    // duplicate cluster moves as a unit and can never straddle splits.
    // The query MEASURES the difference: for the grouped scheme and a
    // naive per-doc scheme it reports near-dup pairs crossing a split
    // boundary (group: 0 by construction — the assignment is a function
    // of the cluster key; naive: the planted pairs leak) plus the split
    // sizes, which stay ~80/10/10 because duplicate clusters are small.
    // Scale: reuses the bounded LSH edge set + O(log d) CC of the dedup
    // lane; assignment is one keyed left join (cluster labels exist only
    // for paired docs, a fraction of the corpus); the leak counts are two
    // keyed joins of pairs→assignment. Nothing rescans text; at 100 TB
    // the split is a metadata pass over doc ids.
    q(
      "q_split_leakfree",
      splitLeakfreeSql
    ) { (s, dir) =>
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val pairs = DedupQueries.simhashPairs(s, dir)
        .select(col("doc_a"), col("doc_b")).persist(MEMORY_AND_DISK)
      // CC's loop actions phased (round-20 attribution sweep)
      val comp = graft.Bench.phase("q_split_leakfree.cluster") {
        DedupQueries.connectedComponents(s, pairs) // (doc_id, comp)
      }
      val d = Tables(s, dir).documents.select(col("doc_id"))
      val ids = d.unionByName(d.select((col("doc_id") + 1000000L).as("doc_id")))
      val asg = ids.join(comp, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("grp"))
        .withColumn("split_group",
          when(col("grp") % 10 < 7, "train")
            .when(col("grp") % 10 < 9, "val").otherwise("test"))
        // naive per-doc scheme: modulus chosen NOT to divide the planted
        // +1000000 id offset, or the fixture would hide the leak it plants
        .withColumn("split_naive",
          when(col("doc_id") % 7 < 5, "train")
            .when(col("doc_id") % 7 === 5, "val").otherwise("test"))
        .persist(MEMORY_AND_DISK)
      def scheme(name: String, splitCol: String): DataFrame = {
        val sizes = asg.agg(
          sum(when(col(splitCol) === "train", 1L).otherwise(0L)).as("n_train"),
          sum(when(col(splitCol) === "val", 1L).otherwise(0L)).as("n_val"),
          sum(when(col(splitCol) === "test", 1L).otherwise(0L)).as("n_test"))
        val crossed = pairs
          .join(asg.select(col("doc_id").as("doc_a"), col(splitCol).as("sa")), "doc_a")
          .join(asg.select(col("doc_id").as("doc_b"), col(splitCol).as("sb")), "doc_b")
          .agg(coalesce(sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)), lit(0L))
            .as("n_cross"))
        crossed.crossJoin(sizes).select(lit(name).as("scheme"),
          col("n_cross"), col("n_train"), col("n_val"), col("n_test"))
      }
      graft.plans.AuditFrames.forced("q_split_leakfree", "rollup") {
        scheme("group", "split_group").unionByName(scheme("naive", "split_naive"))
      }
    },

    // ★ Importance resampling for domain-targeted data selection — the
    // DSIR shape (Xie et al. 2023, "Data Selection for Language Models
    // via Importance Resampling"): estimate hashed-ngram bag-of-words
    // distributions for a TARGET domain (here lang='en', the in-domain
    // exemplar) and the RAW corpus, weight every document by its
    // log importance ratio Σ_features ln(p̂_tgt(b)/p̂_raw(b)) (+1-smoothed
    // over B=128 hash buckets), and draw a fixed-size sample by Gumbel
    // top-k (key = logw + Gumbel noise ⟺ sampling ∝ exp(logw) without
    // replacement). Features are word unigrams + bigrams hashed through
    // the engines' one shared hash (md5 hex → int, the q_shuffle_order
    // idiom); the Gumbel uniform comes from a seeded md5 of doc_id so the
    // draw is REPRODUCIBLE across engines and reruns (the q_sample_weighted
    // discipline). Determinism: bucket counts are exact integers; each
    // bucket's log-ratio is ONE libm ln of one correctly-rounded division
    // (integer products < 2^53, exact in double); per-doc folds run in
    // sorted-bucket order so both engines replay the identical IEEE sum
    // (the q_quality_perplexity trick); ordering is on the floored key
    // with a doc_id tie-break. Scale shape: two passes over the token
    // stream (bucket histogram, then per-doc bucket tfs — the q_tfidf
    // envelope), a B-row broadcast back, and a TakeOrderedAndProject
    // top-k; no global sort, no pairwise work, O(B) driver-safe stats.
    q(
      "q_importance_resample",
      s"""WITH ${dsirCtes("documents", "")}
        |SELECT doc_id, lang, n_feats,
        |  floor(logw * 1e6) / 1e6 + 0.0 AS logw_f,
        |  floor(key * 1e6) / 1e6 + 0.0 AS skey
        |FROM keyed ORDER BY skey DESC, doc_id LIMIT 30""".stripMargin
    ) { (s, dir) =>
      // fused md5-hex-prefix (12 hex chars = first 6 digest bytes; long →
      // double is exact below 2^48, same value as conv's decimal-string
      // parse) — round-21, the dsirWeightsToks change
      val u = (graft.functions.TextHashExpressions.md5Prefix(
          concat(lit("dsir42#"), col("doc_id").cast("string")), 12)
          .cast("double") + 0.5) / 281474976710656.0
      // one fully-lazy pipeline (the double feature explode is the
      // MEASURED fastest shape — see dsirWeightsToks), so attribution is
      // a single forced phase; the audit sees the pre-force plan
      graft.plans.AuditFrames.forced("q_importance_resample", "weights_topk") {
        dsirWeights(s, dir)
          .withColumn("key", col("logw") - log(-log(u)))
          .select(col("doc_id"), col("lang"), col("n_feats"),
            (floor(col("logw") * 1e6) / 1e6 + 0.0).as("logw_f"),
            (floor(col("key") * 1e6) / 1e6 + 0.0).as("skey"))
          .orderBy(col("skey").desc, col("doc_id"))
          .limit(30)
      }
    }
  )

  /** q_corpus_pipeline's staged body, exposed private[graft] for
    * PlanGuardSpec: (the decontaminated-survivor frame `d` — whose plan
    * closure holds the whole stage chain back to the single documents
    * scan, now that the resample checkpoint truncates the declared
    * output's lineage — the UN-checkpointed resample survivor join,
    * whose closure proves the DSIR stage itself adds no new file scan
    * and no pair scan (round-18 ADVICE: the stage-frame walk ended at
    * `d` and the output walk started past the checkpoint, leaving the
    * resample plan unguarded) — and the declared output). */
  private[graft] def corpusPipelineStages(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      // Per-stage phase timers (the q_compact_apply precedent): each
      // persisted stage frame is FORCED inside its phase — the same
      // materializations the final count would trigger anyway, just
      // sequenced so Bench's artifact attributes the composite headline
      // per stage without re-profiling (the round-13 artifact's rising
      // rep profile was unattributable exactly because this lane had no
      // phases; since round 18 every stage through mix_pack is phased
      // and the resample checkpoint keeps the caller's action from
      // re-analyzing the weight lineage — 97% of the headline lands in
      // phases).
      // ONE parquet scan: every stage derives from this persisted base
      val base = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"), col("text"), col("source"))
        .persist(MEMORY_AND_DISK)
      // stage 0 — canonical-URL dedup on the raw ingest (C4's stage 0,
      // the q_dedup_canonical lane verbatim): collapse crawl variants of
      // the same canonical URL BEFORE any content work, keeping the
      // longest text per canonical key. The eval slice for stage 4 stays
      // pre-canonical — the benchmark set is an EXTERNAL corpus, not a
      // survivor of this pipeline's dedup.
      val c0 = graft.Bench.phase("q_corpus_pipeline.canonical") {
        val keep = DedupQueries.canonicalAssign(
            base.select(col("doc_id"), col("text"), col("source")))
          .filter(col("keep")).select(col("doc_id"))
        val b = base.select(col("doc_id"), col("lang"), col("text"))
          .join(keep, "doc_id")
          .persist(MEMORY_AND_DISK) // feeds the variant explode
        b.count()
        b
      }
      // ingest — corpus = originals + planted near-dup variants via a
      // per-row explode (no second scan of documents)
      val corpus0 = c0.select(explode(array(
          struct(col("doc_id"), col("lang"), col("text")),
          struct((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
            concat_ws(" ", filter(split(col("text"), " "), (_, i) => i % 7 =!= 0)).as("text"))
        )).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"), col("r.text").as("text"))
      // stage 1 — composite filter (q_corpus_filter's keep rules). The
      // token array is NOT carried through the stage caches: the
      // round-18 verdict suggested sharing one tokens frame across
      // minhash/decontaminate/resample, and the same-host A/B measured
      // the combined proposal 1.7 s SLOWER at sf0.1 (8.41 → 10.09
      // min-of-3) — columnar caching of array<string> columns costs
      // more to build and deserialize across four stage persists than
      // re-running split(text) per stage over the cached strings
      // (variant ladder in docs/SCALING.md's round-19 negative-result
      // note). Each stage tokenizes its own cached text, exactly like
      // the oracle's per-CTE string_split.
      val f = corpus0.withColumn("l", split(col("text"), " "))
        .withColumn("n_tokens", size(col("l")).cast("long"))
        .filter(col("n_tokens") >= 20 &&
          size(array_distinct(col("l"))).cast("double") / col("n_tokens") >= 0.3)
        .drop("l")
      // stage 2 — exact dedup, keep-first by content hash
      val e = graft.Bench.phase("q_corpus_pipeline.filter_exact") {
        val e0 = f.withColumn("rn", row_number().over(
            Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
          .filter(col("rn") === 1).drop("rn")
          .persist(MEMORY_AND_DISK) // feeds shingles, anti-join, output lineage
        e0.count()
        e0
      }
      // stage 3 — MinHash-LSH near-dup dedup: candidates off the cached
      // shingle frame, exact-Jaccard verify, greedy keep-lowest-id
      val m = graft.Bench.phase("q_corpus_pipeline.minhash") {
        val sa = DedupQueries.shingleArrays(e).persist(MEMORY_AND_DISK)
        val pairs = DedupQueries.jaccardVerify(sa, DedupQueries.minhashCandsFrom(sa), 0.3)
        val m0 = e.join(pairs.select(col("doc_b").as("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          .persist(MEMORY_AND_DISK) // feeds the contamination grams + survivor side
        m0.count()
        m0
      }
      // stage 4 — decontaminate: drop the eval slice itself plus any
      // survivor sharing a word-8-gram with it (eval index broadcasts)
      val d = graft.Bench.phase("q_corpus_pipeline.decontaminate") {
        val evalG = grams8(s,
          base.filter(col("doc_id") % evalMod === 0).select(col("doc_id"), col("text")),
          "eval_id")
        val contaminated = grams8(s, m.select(col("doc_id"), col("text")), "doc_id")
          .join(broadcast(evalG.select(col("s")).distinct()), "s")
          .select(col("doc_id")).distinct()
        val d0 = m.filter(col("doc_id") % evalMod =!= 0)
          .join(contaminated, Seq("doc_id"), "left_anti")
          .persist(MEMORY_AND_DISK) // feeds the quota agg + the ranked side
        d0.count()
        d0
      }
      // stage 5 — DSIR importance resample (q_importance_resample's
      // engine COMPOSED into the pipeline, round-17 verdict item 6):
      // hashed-ngram bucket weights with the decontaminated survivors as
      // the RAW distribution and their lang='en' slice as the target,
      // Gumbel top-k at the FIXED [[dsirPipelineBudget]] — the
      // production budget semantics, and the scale-safe plan
      // (TakeOrderedAndProject on the floored key; a proportional
      // budget would demand a global sort). Below the budget boundary
      // the stage is an exact pass-through in both engines (rank ≤ k
      // keeps everything) — the IvfProvision floor idiom, so the small
      // fixtures exercise the no-op arm and sf0.1 the selecting arm.
      val (resamplePre, d2) = graft.Bench.phase("q_corpus_pipeline.resample") {
        // fused md5-hex-prefix Gumbel seed — same value as the conv
        // chain (round-21, the dsirWeightsToks change)
        val u = (graft.functions.TextHashExpressions.md5Prefix(
            concat(lit("dsir42#"), col("doc_id").cast("string")), 12)
            .cast("double") + 0.5) / 281474976710656.0
        val sel = dsirWeightsDocs(d.select(col("doc_id"), col("lang"), col("text")))
          .withColumn("key", col("logw") - log(-log(u)))
          .orderBy((floor(col("key") * 1e6) / 1e6).desc, col("doc_id"))
          .limit(dsirPipelineBudget)
          .select(col("doc_id"))
        // the selected-survivor frame lands as an EAGER local checkpoint,
        // not a persist: the DSIR aggregation subtree must leave the
        // lineage here, or every downstream action (mix quota, pack, the
        // caller's) re-analyzes it — measured ~5 s of pure Catalyst
        // work charged to a ≤256-row window input (the
        // q_ann_recall_graph round-18 lesson). The plan-guard's
        // single-scan proof moved to the exposed stage frames
        // (corpusPipelineStages), which is where the chain still lives —
        // including the UN-checkpointed `pre` frame returned below, so
        // the resample plan itself (weights, Gumbel top-k, survivor
        // join) stays under guard too.
        // the checkpoint materializes only what the mix/pack tail reads —
        // carrying text+tokens into the leaf would double its IO for
        // columns nothing downstream touches
        val pre = d.join(sel, "doc_id")
          .select(col("doc_id"), col("lang"), col("n_tokens"))
        (pre, pre.localCheckpoint(true))
      }
      // stages 6+7 — corpus mix (data-derived per-language quota, 2× min)
      // and sequence packing (2048-token bins per language): phase-timed
      // and forced (round-15 verdict item 3 — the tail ran in the
      // caller's action and its cost was unattributable; phases must sum
      // to ~the headline)
      val out = graft.Bench.phase("q_corpus_pipeline.mix_pack") {
        // per-language caps land on the driver as an O(|langs|) map (the
        // DriverLocalGate shape — languages are a config-sized set at any
        // corpus size), replacing a broadcast-join subtree that cost two
        // extra jobs per run; the cap rule (2× the smallest language) is
        // unchanged and the oracle's quota CTE replays it
        val allCaps = d2.groupBy(col("lang")).agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
        // mn is computed over ALL groups INCLUDING a null lang (round-16
        // ADVICE: the oracle's quota CTE takes min(n) over every counts
        // row, so a null-lang group that happens to be smallest must
        // lower every language's cap here too); only the cap MAP drops
        // the null key — a null lang never matches the quota join in
        // either engine. minOption: a fully-filtered corpus must yield
        // an empty result, not an empty.min throw.
        val mn = allCaps.map(_._2).minOption.getOrElse(0L)
        val capOf = typedLit(allCaps.filter(_._1 != null)
          .map { case (l, n) => l -> math.min(n, 2 * mn) }.toMap)
        val mixed = d2.withColumn("rk", row_number().over(
            Window.partitionBy(col("lang"))
              .orderBy(md5(concat(lit("mix42#"), col("doc_id").cast("string"))))).cast("long"))
          .filter(col("rk") <= element_at(capOf, col("lang")))
        // sequence packing: 2048-token bins per language
        val packed = mixed.withColumn("cum", sum(col("n_tokens")).over(
            Window.partitionBy(col("lang")).orderBy(col("doc_id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            expr("(cum - n_tokens) div 2048").as("bin"))
          .persist(MEMORY_AND_DISK)
        packed.count()
        packed
      }
    (d, resamplePre, out)
  }

  /** The DSIR weight/key CTE chain over relation `rel`, CTE names
    * prefixed with `p` — shared verbatim by the standalone
    * q_importance_resample oracle (rel = documents, p = "") and the
    * pipeline's resample stage (rel = d, p = "r") so the two engines'
    * bucket arithmetic and Gumbel key can never drift between the
    * standalone and composed uses. Ends at `${p}keyed(doc_id, lang,
    * n_feats, logw, key)`. */
  private[queries] def dsirCtes(rel: String, p: String): String =
    s"""${p}toks AS (SELECT doc_id, lang, string_split(text, ' ') AS ts FROM $rel),
      |${p}grams AS (
      |  SELECT doc_id, lang, unnest(list_concat(ts,
      |    CASE WHEN len(ts) >= 2
      |      THEN list_transform(generate_series(1, len(ts) - 1), i -> ts[i] || '_' || ts[i + 1])
      |      ELSE [] END)) AS g
      |  FROM ${p}toks),
      |${p}feat AS (SELECT doc_id, lang,
      |    ('0x' || substr(md5(g), 1, 6))::BIGINT % 128 AS b FROM ${p}grams),
      |${p}bucket AS (SELECT b, count(*)::BIGINT AS cr,
      |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS ct
      |  FROM ${p}feat GROUP BY 1),
      |${p}tot AS (SELECT sum(cr)::BIGINT AS tr, sum(ct)::BIGINT AS tt FROM ${p}bucket),
      |${p}contrib AS (SELECT b,
      |    ln(((ct + 1)::DOUBLE * (tr + 128)::DOUBLE) /
      |       ((cr + 1)::DOUBLE * (tt + 128)::DOUBLE)) AS cb
      |  FROM ${p}bucket CROSS JOIN ${p}tot),
      |${p}tfb AS (SELECT doc_id, lang, b, count(*)::BIGINT AS tf FROM ${p}feat GROUP BY 1, 2, 3),
      |${p}dterm AS (SELECT t.doc_id, t.lang, t.b, t.tf::DOUBLE * c.cb AS term, t.tf
      |  FROM ${p}tfb t JOIN ${p}contrib c USING (b)),
      |${p}dw AS (SELECT doc_id, lang, list(term ORDER BY b) AS terms,
      |    sum(tf)::BIGINT AS n_feats FROM ${p}dterm GROUP BY 1, 2),
      |${p}keyed AS (SELECT doc_id, lang, n_feats, list_sum(terms) AS logw,
      |    list_sum(terms) - ln(-ln(
      |      (('0x' || substr(md5('dsir42#' || doc_id), 1, 12))::BIGINT + 0.5)
      |        / 281474976710656.0)) AS key
      |  FROM ${p}dw)""".stripMargin

  /** q_importance_resample's weight engine, exposed for
    * ImportanceResampleSpec: per-doc (doc_id, lang, terms, n_feats, logw)
    * where logw = Σ_features ln(p̂_tgt(bucket)/p̂_raw(bucket)) folded in
    * sorted-bucket order (see the lane's determinism notes). */
  private[graft] def dsirWeights(s: SparkSession, dir: String): DataFrame =
    dsirWeightsDocs(Tables(s, dir).documents)

  /** The weight engine over an explicit (doc_id, lang, text) frame —
    * split so the q_corpus_pipeline resample stage scores the
    * DECONTAMINATED SURVIVORS (its raw distribution is the pipeline's,
    * not the ingest corpus's) through the same text. */
  private[graft] def dsirWeightsDocs(docs: DataFrame): DataFrame =
    dsirWeightsToks(docs
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ts")))

  /** The weight engine over a PRE-TOKENIZED (doc_id, lang, ts) frame.
    * The feature explode IS evaluated twice (the bucket-count branch
    * feeds a broadcast, the per-doc tf branch the main stage) — and
    * that is the MEASURED fastest shape: round 19's A/B tried both of
    * the round-18 verdict's proposed fixes and they REGRESSED at sf0.1
    * (docs/SCALING.md "negative result" section): persisting the
    * per-doc tf rollup to derive the bucket counts from it cost
    * +1.2-1.4 s (the ~1M-row columnar cache build exceeds the
    * re-explode, which is linear and embarrassingly parallel), and
    * carrying a shared token array through the pipeline's stage caches
    * was neutral-to-negative on top (array<string> columnar
    * build/deserialize per stage offsets the split(text) it saves).
    * Both branches fold the same feat expression, so results are
    * identical either way — the choice is purely physical. */
  private[graft] def dsirWeightsToks(toks: DataFrame): DataFrame = {
    val B = 128
    val grams = toks.select(col("doc_id"), col("lang"),
      explode(concat(col("ts"),
        when(size(col("ts")) >= 2,
          expr("transform(sequence(0, size(ts) - 2), i -> concat(ts[i], '_', ts[i + 1]))"))
          .otherwise(array().cast("array<string>")))).as("g"))
    // md5Prefix = fused conv(substring(md5(g),1,6),16,10).cast(long)
    // (round-21, guide §4/verdict item 3): same value bit-for-bit —
    // md5's hex prefix read base-16 IS the digest's first 3 bytes — but
    // zero intermediate string allocations per gram, and this expression
    // runs once per gram in BOTH branches of the double explode.
    val feat = grams.select(col("doc_id"), col("lang"),
      (graft.functions.TextHashExpressions.md5Prefix(col("g"), 6) % B).as("b"))
    val bucket = feat.groupBy(col("b")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
    val tot = bucket.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    val contrib = bucket.crossJoin(broadcast(tot)).select(col("b"),
      log(((col("ct") + 1).cast("double") * (col("tr") + B).cast("double")) /
          ((col("cr") + 1).cast("double") * (col("tt") + B).cast("double"))).as("cb"))
    feat.groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("tf"))
      .join(broadcast(contrib), "b")
      .select(col("doc_id"), col("lang"), col("b"),
        (col("tf").cast("double") * col("cb")).as("term"), col("tf"))
      .groupBy(col("doc_id"), col("lang")).agg(
        sort_array(collect_list(struct(col("b"), col("term")))).as("terms"),
        sum(col("tf")).as("n_feats"))
      .withColumn("logw",
        aggregate(col("terms"), lit(0.0), (a, x) => a + x.getField("term")))
  }

  /** Oracle for q_split_leakfree: the simhash edge set + recursive-CTE
    * connected components (same shape as q_dedup_cluster's oracle), then
    * both split schemes and their cross-split pair counts. */
  private lazy val splitLeakfreeSql: String =
    s"""WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM (${DedupQueries.simhashSql})),
       |nodes AS (SELECT DISTINCT doc_id FROM (
       |  SELECT doc_a AS doc_id FROM pairs UNION SELECT doc_b FROM pairs)),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach(node, comp) AS (
       |  SELECT doc_id, doc_id FROM nodes
       |  UNION
       |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node),
       |lab AS (SELECT node AS doc_id, min(comp) AS grp FROM reach GROUP BY node),
       |ids AS (SELECT doc_id FROM documents
       |        UNION ALL SELECT doc_id + 1000000 FROM documents),
       |sp AS (
       |  SELECT i.doc_id, coalesce(l.grp, i.doc_id) AS grp,
       |    CASE WHEN coalesce(l.grp, i.doc_id) % 10 < 7 THEN 'train'
       |         WHEN coalesce(l.grp, i.doc_id) % 10 < 9 THEN 'val'
       |         ELSE 'test' END AS split_group,
       |    CASE WHEN i.doc_id % 7 < 5 THEN 'train'
       |         WHEN i.doc_id % 7 = 5 THEN 'val'
       |         ELSE 'test' END AS split_naive
       |  FROM ids i LEFT JOIN lab l ON i.doc_id = l.doc_id),
       |crossed AS (
       |  SELECT a.split_group AS ga, b.split_group AS gb,
       |         a.split_naive AS na, b.split_naive AS nb
       |  FROM pairs p JOIN sp a ON p.doc_a = a.doc_id
       |               JOIN sp b ON p.doc_b = b.doc_id)
       |SELECT 'group' AS scheme,
       |  (SELECT coalesce(sum(CASE WHEN ga <> gb THEN 1 ELSE 0 END), 0)::BIGINT
       |     FROM crossed) AS n_cross,
       |  sum(CASE WHEN split_group = 'train' THEN 1 ELSE 0 END)::BIGINT AS n_train,
       |  sum(CASE WHEN split_group = 'val' THEN 1 ELSE 0 END)::BIGINT AS n_val,
       |  sum(CASE WHEN split_group = 'test' THEN 1 ELSE 0 END)::BIGINT AS n_test
       |FROM sp
       |UNION ALL
       |SELECT 'naive',
       |  (SELECT coalesce(sum(CASE WHEN na <> nb THEN 1 ELSE 0 END), 0)::BIGINT
       |     FROM crossed),
       |  sum(CASE WHEN split_naive = 'train' THEN 1 ELSE 0 END)::BIGINT,
       |  sum(CASE WHEN split_naive = 'val' THEN 1 ELSE 0 END)::BIGINT,
       |  sum(CASE WHEN split_naive = 'test' THEN 1 ELSE 0 END)::BIGINT
       |FROM sp""".stripMargin

  /** Temperature-flattened sampling quotas over a `(lang, n)` count frame
    * (q_corpus_mix_temperature's engine): weight n^alpha in ×1e6 integer
    * fixed point, budget = half the corpus, quota = min(n, budget·w/Σw)
    * by integer division. Returns (lang, n, cap). Factored out so
    * TemperatureMixSpec can prove the flattening property on a planted
    * skew the uniform fixture can't show.
    *
    * DETERMINISM: only α = 0.75 (weight sqrt(n·sqrt(n)) — IEEE
    * correctly-rounded ×/sqrt only, bit-identical in any engine) and
    * α = 1.0 (pure integer n·1e6) are supported; a libm pow here would
    * hang cross-engine parity on its ~1-ulp rounding whenever a weight
    * lands within an ulp of an integer (the same reason q_drift_report
    * uses TV distance over KL). 64-bit headroom: budget·wt < 2^63
    * requires (N/2)·1e6·n^0.75 in range — worst case n = N gives
    * N^1.75 < 1.8e13, i.e. total corpora to ~4×10⁷ docs; beyond that
    * drop the fixed-point scale to ×1e3 (→ ~10⁹ docs) — quota
    * granularity, not semantics. Spark's non-ANSI multiply would WRAP
    * silently past the bound (a negative cap filters a whole language),
    * so a wrapped-negative quota trips a loud per-row error instead. */
  private[graft] def temperatureQuotas(counts: DataFrame, alpha: Double): DataFrame = {
    val wt =
      if (alpha == 1.0) (col("n") * lit(1000000L)).as("wt")
      else if (alpha == 0.75)
        floor(sqrt(col("n").cast("double") * sqrt(col("n").cast("double"))) * lit(1e6))
          .cast("long").as("wt")
      else throw new IllegalArgumentException(
        s"temperatureQuotas: alpha $alpha has no deterministic integer path (use 0.75 or 1.0)")
    val w = counts.select(col("lang"), col("n"), wt)
    val tot = w.agg(sum(col("wt")).as("tw"), expr("sum(n) div 2").as("budget"))
    w.crossJoin(broadcast(tot))
      .select(col("lang"), col("n"),
        least(col("n"),
          when(expr("budget * wt div tw") < 0,
            raise_error(lit("temperatureQuotas: 64-bit overflow in budget*wt — " +
              "drop the fixed-point scale (see scaladoc)")))
            .otherwise(expr("budget * wt div tw"))).as("cap"))
  }
}
