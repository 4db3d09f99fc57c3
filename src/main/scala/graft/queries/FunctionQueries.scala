package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import QueryDef.q

/** Scalar/window/pivot function coverage beyond what the pipeline queries
  * already exercise: lead/lag, pivot, string functions, date/time parts,
  * exact percentiles. All Catalyst built-ins, all codegen-friendly.
  */
object FunctionQueries {

  val defs: Seq[QueryDef] = Seq(

    // lead/lag — inter-event gaps per user.
    q(
      "q_window_lead_lag",
      """SELECT event_id, user_id,
        |  floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_sec,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |FROM events""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir).events
        .withColumn("ts_sec", expr("ts div 1000000000"))
        .select(
          col("event_id"), col("user_id"),
          (col("ts_sec") - lag(col("ts_sec"), 1).over(w)).as("gap_sec"),
          lead(col("event_type"), 1).over(w).as("next_type")
        )
    },

    // Pivot — per-user event-type counts as columns. The oracle spells the
    // same shape with CASE sums (engine-portable pivot).
    q(
      "q_pivot",
      """SELECT user_id,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
        |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view,
        |  sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
        |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error
        |FROM events GROUP BY user_id""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir).events
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "signup", "purchase", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
    },

    // String functions over documents: case, trim/pad, substring, replace,
    // split-part, edit distance between the first two tokens.
    q(
      "q_string_funcs",
      """SELECT doc_id,
        |  upper(string_split(text, ' ')[1]) AS first_upper,
        |  lpad(string_split(text, ' ')[2], 12, '_') AS second_padded,
        |  substr(text, 1, 16) AS head16,
        |  replace(substr(text, 1, 32), ' ', '-') AS dashed,
        |  levenshtein(string_split(text, ' ')[1], string_split(text, ' ')[2]) AS edit_dist,
        |  length(text) AS n_chars
        |FROM documents""".stripMargin
    ) { (s, dir) =>
      val toks = split(col("text"), " ")
      // try_element_at for index 2: a single-token doc must yield NULL
      // (DuckDB list[2] semantics), not an ANSI out-of-bounds error
      val second = try_element_at(toks, lit(2))
      Tables(s, dir).documents.select(
        col("doc_id"),
        upper(element_at(toks, 1)).as("first_upper"),
        lpad(second, 12, "_").as("second_padded"),
        substring(col("text"), 1, 16).as("head16"),
        regexp_replace(substring(col("text"), 1, 32), " ", "-").as("dashed"),
        levenshtein(element_at(toks, 1), second).as("edit_dist"),
        length(col("text")).as("n_chars")
      )
    },

    // Date/time parts and arithmetic over orders.
    q(
      "q_date_funcs",
      """SELECT o_orderkey,
        |  year(o_orderdate)::INT AS y, month(o_orderdate)::INT AS m,
        |  dayofweek(o_orderdate)::INT % 7 AS dow,
        |  strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
        |  datediff('day', TIMESTAMP '1995-01-01', o_orderdate)::INT AS days_since_95
        |FROM orders""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir).orders.select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        // DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1 → align
        (dayofweek(col("o_orderdate")) - 1).as("dow"),
        date_format(col("o_orderdate") + expr("INTERVAL 90 DAYS"), "yyyy-MM-dd").as("due_date"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since_95")
      )
    },

    // Exact interpolated percentiles (both engines: linear interpolation).
    q(
      "q_agg_percentile",
      """SELECT l_returnflag,
        |  floor(quantile_cont(l_extendedprice::DOUBLE, 0.5) * 100) / 100 AS p50,
        |  floor(quantile_cont(l_extendedprice::DOUBLE, 0.95) * 100) / 100 AS p95,
        |  floor(quantile_cont(l_quantity::DOUBLE, 0.25) * 100) / 100 AS q1_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          // percentile() is Spark's exact linear-interpolated quantile —
          // same semantics as DuckDB quantile_cont (percentile_approx
          // returns an actual data value, which would NOT match).
          // floor(x*100)/100 instead of round(x,2): a quantile can land
          // exactly on a .xx5 boundary, where Spark rounds the exact binary
          // expansion (BigDecimal) but DuckDB rounds x*100 in doubles —
          // engine-dependent. floor over the SAME IEEE double ops is
          // deterministic on both.
          (floor(percentile(col("l_extendedprice"), lit(0.5)) * 100) / 100).as("p50"),
          (floor(percentile(col("l_extendedprice"), lit(0.95)) * 100) / 100).as("p95"),
          (floor(percentile(col("l_quantity"), lit(0.25)) * 100) / 100).as("q1_qty")
        )
    },

    // Higher-order array functions — filter/transform/aggregate lambdas
    // over the token array (DuckDB: list_filter/list_transform/
    // list_aggregate). All codegen'd per-row expressions, zero shuffle;
    // identical sum/len arithmetic on both engines.
    q(
      "q_array_funcs",
      s"""SELECT doc_id,
        |  len(string_split(text, ' '))::BIGINT AS n_tokens,
        |  len(list_filter(string_split(text, ' '), t -> length(t) > 4))::BIGINT AS n_long,
        |  list_aggregate(list_transform(string_split(text, ' '), t -> length(t)), 'sum')::BIGINT AS total_chars,
        |  ${CrossRound.sql("list_aggregate(list_transform(string_split(text, ' '), t -> length(t)), 'sum')::DOUBLE / len(string_split(text, ' '))", 4)} AS avg_len
        |FROM documents""".stripMargin
    ) { (s, dir) =>
      val ts = split(col("text"), " ")
      Tables(s, dir).documents.select(
        col("doc_id"),
        size(ts).cast("long").as("n_tokens"),
        size(filter(ts, t => length(t) > 4)).cast("long").as("n_long"),
        aggregate(ts, lit(0L), (acc, t) => acc + length(t)).as("total_chars"),
        // floor-first: integer ratio (decimal-half class — see CrossRound)
        CrossRound.col(aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          size(ts), 4).as("avg_len")
      )
    },

    // JSON path functions over the raw `props` payload plus a synthesized
    // nested document (built with engine-portable string concat): scalar
    // extract, nested-object extract, 0-based array index, array length.
    // get_json_object is the portable JSONPath surface (from_json's typed
    // structs are the Spark-native path, exercised by q_parse_enrich).
    // Per-row expressions, zero shuffle.
    q(
      "q_json_funcs",
      """WITH j AS (
        |  SELECT event_id, props,
        |    '{"meta":{"type":"' || event_type || '","vals":[' ||
        |      (event_id % 5) || ',' || (event_id % 7) || ']}}' AS doc
        |  FROM events)
        |SELECT event_id,
        |  json_extract_string(props, '$.k')::BIGINT AS k,
        |  json_extract_string(doc, '$.meta.type') AS mtype,
        |  json_extract(doc, '$.meta.vals[1]')::BIGINT AS v1,
        |  json_array_length(doc, '$.meta.vals')::BIGINT AS n_vals
        |FROM j""".stripMargin
    ) { (s, dir) =>
      val doc = concat(
        lit("{\"meta\":{\"type\":\""), col("event_type"), lit("\",\"vals\":["),
        col("event_id") % 5, lit(","), col("event_id") % 7, lit("]}}"))
      Tables(s, dir).events
        .withColumn("doc", doc)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          get_json_object(col("doc"), "$.meta.type").as("mtype"),
          get_json_object(col("doc"), "$.meta.vals[1]").cast("long").as("v1"),
          json_array_length(get_json_object(col("doc"), "$.meta.vals")).cast("long").as("n_vals")
        )
    }
  )
}
