package graft.queries

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
      val d = Tables(s, dir).documents
      def grams8 = {
        val l = split(col("text"), " ")
        array_distinct(transform(
          when(size(l) >= 8, sequence(lit(1), size(l) - 7))
            .otherwise(array().cast("array<int>")),
          i => concat_ws(" ", (0 to 7).map(o => element_at(l, i + o)): _*)
        ))
      }
      val evalShingles = d.filter(col("doc_id") % evalMod === 0)
        .select(col("doc_id").as("eval_id"), explode(grams8).as("s")).distinct()
      val train = d.filter(col("doc_id") % evalMod =!= 0)
        .select(col("doc_id"), col("text"))
        .unionByName(
          d.filter(col("doc_id") % evalMod === 0).select(
            (col("doc_id") + 2000000L).as("doc_id"),
            concat_ws(" ", filter(split(col("text"), " "), (_, i) => i % 13 =!= 0)).as("text")
          ))
      val trainShingles = train.select(col("doc_id"), explode(grams8).as("s")).distinct()
      trainShingles
        .join(broadcast(evalShingles), "s") // eval index is the small fixed side
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("s")).as("n_shared"),
          countDistinct(col("eval_id")).as("n_eval_docs"))
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
    }
  )
}
