package graft.queries

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

  // Deterministic PII injected into every document (and into the oracle
  // identically) so the scrubber always has something to find on top of
  // whatever occurs naturally.
  private val emailPat = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val ipPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

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
      import s.implicits._
      val d = Tables(s, dir).documents
      // Distinct word-8-grams, imperatively: the declarative HOF shape
      // (transform + 8 element_ats + concat_ws per shingle) evaluates
      // interpreted and measured ~8 s at sf0.1; this per-partition loop
      // is the codebase's sanctioned row-imperative lane (~4×). Per-doc
      // dedup via HashSet ≡ array_distinct, so pairs come out unique.
      def grams8(df: org.apache.spark.sql.DataFrame, idCol: String) =
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
      val evalShingles = grams8(
        d.filter(col("doc_id") % evalMod === 0).select(col("doc_id"), col("text")), "eval_id")
      val train = d.filter(col("doc_id") % evalMod =!= 0)
        .select(col("doc_id"), col("text"))
        .unionByName(
          d.filter(col("doc_id") % evalMod === 0).select(
            (col("doc_id") + 2000000L).as("doc_id"),
            concat_ws(" ", filter(split(col("text"), " "), (_, i) => i % 13 =!= 0)).as("text")
          ))
      grams8(train, "doc_id")
        .join(broadcast(evalShingles), "s") // eval index is the small fixed side
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("s")).as("n_shared"),
          countDistinct(col("eval_id")).as("n_eval_docs"))
    },

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
    }
  )
}
