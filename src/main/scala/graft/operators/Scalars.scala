package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.8 — scalar function layer (string / date / math / array /
  * map / json).
  *
  * Reference shapes: slugify (`agent-loop.sh:243-245,270-272`), log-name
  * printf (`agent-loop.sh:274`), truncation (`agent-loop.sh:541-542`),
  * paragraph/sentence split (`telegram-agent.py:214,222`), chunk count
  * (`telegram-agent.py:200-246`), ordered error classification
  * (`agent-loop.sh:393-412` — rate_limit BEFORE timeout), sha256
  * (`agent-loop.sh:251`), date partition key (`agent-loop.sh:533`),
  * exponential backoff (`agent-loop.sh:373-391`), integer percent
  * (`agent-loop.sh:790`), JSON extraction with defaults
  * (`agent-loop.sh:417-422`), array/map handling (`agent-loop.sh:276-291,
  * 422`), cascading defaults (`telegram-agent.py:281`).
  *
  * Everything here is a codegen'd built-in Column expression — zero UDFs —
  * so at 100 TB each stays inside WholeStageCodegen, runs per-row with no
  * serialization boundary, and pushes through the parquet scan where it is
  * a predicate.
  *
  * DuckDB parity notes baked into each oracle: DuckDB `regexp_replace`
  * needs the 'g' flag (Spark's is global by default); double→int goes
  * through floor() both sides (CAST rounds half-away in DuckDB, truncates
  * in Spark); all sums in exact decimal.
  */
object Scalars {
  type Q = (SparkSession, String) => DataFrame

  /** lower → non-alnum runs → '-' → trim '-' → truncate (agent-loop.sh:243-245).
    * Differentially tested against the reference's bash slugify
    * (tools/diff_scalars.py). */
  def slug(c: org.apache.spark.sql.Column, n: Int) =
    substring(
      regexp_replace(
        regexp_replace(lower(c), "[^a-z0-9]+", "-"), "^-+|-+$", ""),
      1, n)

  /** Error classification with the reference's EXACT patterns and
    * precedence (agent-loop.sh:399-411, case-insensitive grep -E);
    * differentially tested against the bash classify_error. */
  def classify(c: org.apache.spark.sql.Column) =
    when(c.rlike("(?i)\\b429\\b|rate_limit|rate limit|too many requests"), "rate_limit")
      .when(c.rlike("(?i)context_length|token limit|maximum context|context window"), "context_overflow")
      .when(c.rlike("(?i)\\b401\\b|authentication|unauthorized|invalid.*api.*key"), "auth")
      .when(c.rlike("(?i)timeout|SIGTERM|timed out|deadline exceeded"), "timeout")
      .when(c.rlike("(?i)ECONNREFUSED|ENOTFOUND|DNS|network|connection refused"), "network")
      .otherwise("unknown")

  val queries: Map[String, Q] = Map(
    "q_str_slugify" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), slug(substring(col("text"), 1, 60), 30).as("slug"))
        .orderBy("doc_id")),

    // %03d-%s--%s.log log-name synthesis.
    "q_str_format" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          format_string("%03d-%s--%s.log", col("doc_id") % 1000, col("lang"),
                        col("source")).as("log_name"))
        .orderBy("doc_id")),

    "q_str_trunc" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          substring(col("text"), 1, 80).as("head80"),
          length(col("text")).as("len"))
        .orderBy("doc_id")),

    // Word split + positional explode (the sentence-split shape).
    "q_str_split_explode" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("word"))
        .orderBy("doc_id", "pos")),

    // Fixed-size chunk accounting: ceil(len/100) in exact int arithmetic.
    "q_str_chunks" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          ((col("n_chars") + 99L) / lit(100L)).cast("bigint").as("n_chunks"),
          substring(col("text"), 1, 100).as("chunk1"))
        .orderBy("doc_id")),

    // Ordered classification cascade — the reference's exact patterns
    // and precedence (agent-loop.sh:399-411): rate_limit,
    // context_overflow, auth, timeout, network, unknown. First match
    // wins. (The reference scans the last 3000 bytes of the log; the
    // corpus documents are all shorter, so full-text is equivalent.)
    "q_str_case_class" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), classify(col("text")).as("error_class"))
        .orderBy("doc_id")),

    "q_hash_sha256" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), sha2(col("text"), 256).as("digest"))
        .orderBy("doc_id")),

    // ISO timestamp + the YYYY-MM-DD daily partition key.
    "q_date_format" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd").as("day_key"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_local"))
        .orderBy("event_id")),

    "q_date_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          year(col("ts")).as("y"), month(col("ts")).as("m"),
          dayofmonth(col("ts")).as("d"), hour(col("ts")).as("h"),
          date_trunc("day", col("ts")).cast("date").cast("string").as("day"))
        .orderBy("event_id")),

    // delay = min(2^attempt * (rate_limit ? 2 : 1), 60) — exact integer
    // shift, jitter excluded for determinism (agent-loop.sh:378).
    "q_math_backoff" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          (col("event_id") % 6).cast("int").as("attempt"),
          least(
            expr("shiftleft(1L, cast(event_id % 6 as int))") *
              when(col("event_type") === "error", 2L).otherwise(1L),
            lit(60L)).as("delay_s"))
        .orderBy("event_id")),

    // Retry/failover routing (agent-loop.sh:725-782): from (attempts,
    // error class) decide abort / failover / retry — precedence-ordered
    // exactly like the reference: attempt cap first, then the
    // rate_limit/timeout failover branch (agent-loop.sh:751-759), then
    // default retry.
    "q_retry_policy" -> ((s, dir) => {
      val attempts = (col("event_id") % 6).cast("int")
      val isRl = col("event_type").isin("error", "view") // stand-in classes
      Tables.events(s, dir)
        .select(col("event_id"), attempts.as("attempts"),
          when(attempts >= 5, "abort")
            .when(isRl && attempts >= 2, "failover")
            .when(isRl, "retry_rl")
            .otherwise("retry").as("decision"))
        .orderBy("event_id")
    }),

    // Integer percent: value*100/window, floored both sides.
    "q_math_pct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          Tables.floorLong(col("l_quantity") * 100d / 50d).as("qty_pct"),
          // Product in exact decimal, round half-away in decimal, THEN to
          // double — rounding the double product directly differs between
          // engines on .xx5 ties.
          round(col("l_extendedprice").cast("decimal(18,4)") *
                (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")), 2)
            .cast("double").as("net_price"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Field extraction with jq-style defaults: present, missing, coalesced.
    "q_json_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          coalesce(get_json_object(col("props"), "$.k").cast("int"), lit(0)).as("k"),
          get_json_object(col("props"), "$.missing").as("missing"),
          coalesce(get_json_object(col("props"), "$.missing"), lit("none")).as("defaulted"))
        .orderBy("event_id")),

    // Full-document parse to a typed struct, then field access.
    "q_json_struct" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          from_json(col("props"), lit("k INT")).getField("k").as("k_typed"),
          (from_json(col("props"), lit("k INT")).getField("k") * 2).as("k_doubled"))
        .orderBy("event_id")),

    // Array manipulation over the embedding vectors — size, element
    // access, append, slice, elementwise transform. Quantized to exact
    // ints (floor(x*1000)) so Spark FLOAT and DuckDB DOUBLE agree.
    "q_array_ops" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          floor(element_at(col("embedding"), 1).cast("double") * 1000).cast("bigint").as("e1_q"),
          aggregate(
            transform(col("embedding"), x => floor(x.cast("double") * 1000).cast("bigint")),
            lit(0L), (acc, x) => acc + x).as("sum_q"),
          size(slice(col("embedding"), 1, 8)).as("head_dim"))
        .orderBy("vec_id")),

    // Collect rows to an ordered array, rendered as a string both sides.
    "q_array_agg" -> ((s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_custkey") < 50)
        .groupBy(col("o_custkey"))
        .agg(
          array_join(
            transform(array_sort(collect_list(col("o_orderkey"))),
                      x => x.cast("string")), ",").as("order_keys"),
          count(lit(1)).as("n"))
        .orderBy("o_custkey")),

    // Map iteration: build a map, read keys/values. Keys render through
    // array_join so the output stays scalar (driver rows must be
    // sortable/hashable — no array/map/struct output columns). Map
    // semantics also asserted in OperatorSpec.
    "q_map_ops" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          map(lit("type"), col("event_type"),
              lit("k"), coalesce(get_json_object(col("props"), "$.k"), lit("0")))
            .as("m"))
        .select(col("event_id"),
          array_join(map_keys(col("m")), ",").as("ks"),
          element_at(col("m"), "type").as("type_v"))
        .orderBy("event_id")),

    // Cascading defaults: first non-null of (missing field, k, literal).
    "q_coalesce_chain" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          coalesce(
            get_json_object(col("props"), "$.stderr"),
            get_json_object(col("props"), "$.k"),
            lit("empty")).as("first_present"))
        .orderBy("event_id")),
  )

  val oracle: Map[String, String] = Map(
    "q_str_slugify" -> """
      SELECT doc_id,
             substr(regexp_replace(regexp_replace(lower(substr(text,1,60)),
                    '[^a-z0-9]+','-','g'), '^-+|-+$','','g'), 1, 30) AS slug
      FROM documents ORDER BY doc_id""",

    "q_str_format" -> """
      SELECT doc_id,
             printf('%03d-%s--%s.log', CAST(doc_id % 1000 AS INTEGER), lang, source) AS log_name
      FROM documents ORDER BY doc_id""",

    "q_str_trunc" -> """
      SELECT doc_id, substr(text,1,80) AS head80,
             CAST(length(text) AS INTEGER) AS len
      FROM documents ORDER BY doc_id""",

    "q_str_split_explode" -> """
      SELECT doc_id,
             CAST(generate_subscripts(string_split(text,' '),1) AS INTEGER) AS pos,
             unnest(string_split(text,' ')) AS word
      FROM documents WHERE doc_id < 100 ORDER BY doc_id, pos""",

    "q_str_chunks" -> """
      SELECT doc_id, n_chars,
             (n_chars + 99) // 100 AS n_chunks,
             substr(text,1,100) AS chunk1
      FROM documents ORDER BY doc_id""",

    "q_str_case_class" -> """
      SELECT doc_id,
             CASE WHEN regexp_matches(text, '(?i)\b429\b|rate_limit|rate limit|too many requests') THEN 'rate_limit'
                  WHEN regexp_matches(text, '(?i)context_length|token limit|maximum context|context window') THEN 'context_overflow'
                  WHEN regexp_matches(text, '(?i)\b401\b|authentication|unauthorized|invalid.*api.*key') THEN 'auth'
                  WHEN regexp_matches(text, '(?i)timeout|SIGTERM|timed out|deadline exceeded') THEN 'timeout'
                  WHEN regexp_matches(text, '(?i)ECONNREFUSED|ENOTFOUND|DNS|network|connection refused') THEN 'network'
                  ELSE 'unknown' END AS error_class
      FROM documents ORDER BY doc_id""",

    "q_hash_sha256" -> """
      SELECT doc_id, sha256(text) AS digest FROM documents ORDER BY doc_id""",

    "q_date_format" -> """
      SELECT event_id,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day_key,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_local
      FROM events ORDER BY event_id""",

    "q_date_extract" -> """
      SELECT event_id,
             CAST(EXTRACT(year FROM ts) AS INTEGER) AS y,
             CAST(EXTRACT(month FROM ts) AS INTEGER) AS m,
             CAST(EXTRACT(day FROM ts) AS INTEGER) AS d,
             CAST(EXTRACT(hour FROM ts) AS INTEGER) AS h,
             strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
      FROM events ORDER BY event_id""",

    "q_math_backoff" -> """
      SELECT event_id,
             CAST(event_id % 6 AS INTEGER) AS attempt,
             CAST(least((1 << CAST(event_id % 6 AS INTEGER)) *
                   (CASE WHEN event_type = 'error' THEN 2 ELSE 1 END), 60) AS BIGINT) AS delay_s
      FROM events ORDER BY event_id""",

    "q_retry_policy" -> """
      SELECT event_id,
             CAST(event_id % 6 AS INTEGER) AS attempts,
             CASE WHEN event_id % 6 >= 5 THEN 'abort'
                  WHEN event_type IN ('error', 'view') AND event_id % 6 >= 2 THEN 'failover'
                  WHEN event_type IN ('error', 'view') THEN 'retry_rl'
                  ELSE 'retry' END AS decision
      FROM events ORDER BY event_id""",

    "q_math_pct" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(floor(l_quantity * 100 / 50) AS BIGINT) AS qty_pct,
             CAST(round(CAST(l_extendedprice AS DECIMAL(18,4)) *
                  (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS net_price
      FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q_json_extract" -> """
      SELECT event_id,
             coalesce(TRY_CAST(json_extract_string(props,'$.k') AS INTEGER), 0) AS k,
             json_extract_string(props,'$.missing') AS missing,
             coalesce(json_extract_string(props,'$.missing'), 'none') AS defaulted
      FROM events ORDER BY event_id""",

    "q_json_struct" -> """
      SELECT event_id,
             TRY_CAST(json_extract_string(props,'$.k') AS INTEGER) AS k_typed,
             TRY_CAST(json_extract_string(props,'$.k') AS INTEGER) * 2 AS k_doubled
      FROM events ORDER BY event_id""",

    "q_array_ops" -> """
      SELECT vec_id,
             CAST(len(embedding) AS INTEGER) AS dim,
             CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS e1_q,
             CAST(list_sum(list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS sum_q,
             CAST(len(embedding[1:8]) AS INTEGER) AS head_dim
      FROM embeddings ORDER BY vec_id""",

    "q_array_agg" -> """
      SELECT o_custkey,
             string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys,
             count(*) AS n
      FROM orders WHERE o_custkey < 50
      GROUP BY o_custkey ORDER BY o_custkey""",

    "q_coalesce_chain" -> """
      SELECT event_id,
             coalesce(json_extract_string(props,'$.stderr'),
                      json_extract_string(props,'$.k'), 'empty') AS first_present
      FROM events ORDER BY event_id""",

    // DuckDB 1.0 map[key] yields a LIST — [1] unwraps the scalar.
    "q_map_ops" -> """
      WITH m AS (
        SELECT event_id,
               MAP {'type': event_type,
                    'k': coalesce(json_extract_string(props, '$.k'), '0')} AS m
        FROM events)
      SELECT event_id,
             array_to_string(map_keys(m), ',') AS ks,
             m['type'][1] AS type_v
      FROM m ORDER BY event_id""",
  )
}
