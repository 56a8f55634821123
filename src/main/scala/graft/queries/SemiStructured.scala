package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Qry, Tables}
import Q._

/** Semi-structured surface (SURVEY.md §2.B G11): JSON extraction with
  * a declared schema, generator/explode paths, higher-order array
  * functions, and map construction/decoding — generalizing the
  * reference's nested-struct handling (task.ts:59-82), the entity
  * explode (task.ts:194), and the occupancy decode table
  * (task.ts:266-275).
  *
  * All of these stay inside whole-stage codegen (no UDFs): from_json,
  * explode and the array lambdas are Catalyst expressions, so the
  * 100 TB plan is scan → generate/project → partial agg → final agg
  * with exactly one shuffle.
  */
object SemiStructured {

  /** JSON parse with declared schema (from_json, like the reference's
    * TypeBox-validated parse task.ts:167,174) + extraction + agg over
    * the parsed field. */
  val q18 = Qry(
    "q18_json_extract",
    (s: SparkSession, d: String) =>
      Tables.events(s, d)
        .withColumn("props_s",
          from_json(col("props"),
            StructType(Seq(StructField("k", LongType)))))
        .withColumn("k", col("props_s.k"))
        .groupBy((col("k") / 10).cast("long").as("k_decile"))
        .agg(count(lit(1)).as("n"),
          dsum(col("value"), 2).as("sum_value"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("k_decile")),
    Some(s"""
      SELECT CAST(json_extract(props, '$$.k') AS BIGINT) // 10
               AS k_decile,
             COUNT(*) AS n,
             ${dsumSql("value", 2)} AS sum_value,
             MIN(CAST(json_extract(props, '$$.k') AS BIGINT)) AS min_k,
             MAX(CAST(json_extract(props, '$$.k') AS BIGINT)) AS max_k
      FROM events
      GROUP BY 1 ORDER BY k_decile"""))

  /** Generator path: explode(split(text)) token stream → global token
    * frequency (the engine's word-count; G11+G15). explode is a
    * Generate node feeding a partial+final hash agg — the classic
    * two-shuffle-free word count (one shuffle, on the token). */
  val q19 = Qry(
    "q19_explode_tokens",
    (s: SparkSession, d: String) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok"))
        .limit(30),
    Some("""
      SELECT tok, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok <> ''
      GROUP BY tok ORDER BY n DESC, tok LIMIT 30"""))

  /** Higher-order array functions over per-customer collected order
    * prices: array_sort → transform → filter → aggregate (fold), plus
    * size/element_at. Lambdas fold sequentially in both engines so
    * double results are bit-identical. */
  val q20 = Qry(
    "q20_array_hof",
    (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .filter(col("o_custkey") < 100)
        .groupBy(col("o_custkey"))
        .agg(sort_array(collect_list(round(col("o_totalprice"), 2)))
          .as("prices"))
        .select(
          col("o_custkey"),
          size(col("prices")).as("n_orders"),
          element_at(col("prices"), 1).as("cheapest"),
          element_at(col("prices"), -1).as("dearest"),
          round(aggregate(col("prices"), lit(0d), (acc, x) => acc + x), 2)
            .as("total"),
          // round to the exact 3-decimal grid of the 0.9-scaled terms
          // (a 2-decimal round can land on a .005 tie where Java
          // HALF_UP and C round-to-binary disagree)
          round(aggregate(
            filter(col("prices"), x => x > 100000d),
            lit(0d), (acc, x) => acc + x * 0.9), 3).as("big_discounted"))
        .orderBy(col("o_custkey"))
    },
    Some("""
      WITH per_cust AS (
        SELECT o_custkey,
               list_sort(list(ROUND(o_totalprice, 2))) AS prices
        FROM orders WHERE o_custkey < 100 GROUP BY o_custkey)
      SELECT o_custkey,
             len(prices) AS n_orders,
             prices[1] AS cheapest,
             prices[-1] AS dearest,
             ROUND(list_reduce(list_prepend(0.0::DOUBLE, prices),
                               (acc, x) -> acc + x), 2) AS total,
             ROUND(list_reduce(
               list_prepend(0.0::DOUBLE,
                 list_filter(prices, x -> x > 100000)),
               (acc, x) -> acc + x * 0.9), 3) AS big_discounted
      FROM per_cust ORDER BY o_custkey"""))

  /** Map construction + decode: map literal as a lookup table
    * (element_at + coalesce fallback) — the relational form of the
    * reference's occupancy decode (task.ts:266-275 'Unknown'
    * fallback). */
  val q21 = Qry(
    "q21_map_decode",
    (s: SparkSession, d: String) => {
      val decode = typedLit(Map(
        "signup" -> "Acquisition", "purchase" -> "Revenue",
        "click" -> "Engagement", "view" -> "Engagement"))
      Tables.events(s, d)
        .select(coalesce(element_at(decode, col("event_type")),
          lit("Unknown")).as("category"), col("value"))
        .groupBy(col("category"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
        .orderBy(col("category"))
    },
    Some(s"""
      SELECT COALESCE(
               (MAP(['signup','purchase','click','view'],
                    ['Acquisition','Revenue','Engagement','Engagement'])
                  [event_type])[1],
               'Unknown') AS category,
             COUNT(*) AS n,
             ${dsumSql("value", 2)} AS sum_value
      FROM events GROUP BY category ORDER BY category"""))

  /** Positional explode: posexplode with the position carried through
    * (G11) — early tokens weighted by 1/(pos+1); position comes from
    * the generator, not a window. */
  val q22 = Qry(
    "q22_posexplode",
    (s: SparkSession, d: String) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .filter(col("tok") =!= "")
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n"),
          round(dsum(lit(1d) / (col("pos") + 1), 8), 6).as("pos_weight"),
          min(col("pos")).as("first_pos"))
        .orderBy(col("n").desc, col("tok"))
        .limit(20),
    Some(s"""
      WITH toks AS (
        SELECT doc_id,
               unnest(list_zip(string_split(text, ' '),
                               range(0, len(string_split(text, ' '))))) AS z
        FROM documents WHERE doc_id < 100)
      SELECT z[1] AS tok, COUNT(*) AS n,
             ROUND(${dsumSql("1.0 / (z[2] + 1)", 8)}, 6) AS pos_weight,
             MIN(z[2]) AS first_pos
      FROM toks WHERE z[1] <> ''
      GROUP BY tok ORDER BY n DESC, tok LIMIT 20"""))

  /** JSON re-serialization: to_json(struct(...)) round-trip — schema
    * key order makes output deterministic (task.ts:314-320 feature
    * assembly analogue). The money field rides as INTEGER CENTS
    * (the q124 rule: integers only → the JSON text is byte-identical
    * cross-engine; a raw double diverges the moment one engine
    * switches to scientific notation — large value domains hit this,
    * caught by the full-registry hostile-cell fuzz gate). */
  val q23 = Qry(
    "q23_to_json",
    (s: SparkSession, d: String) =>
      Tables.events(s, d)
        .filter(col("event_id") < 100)
        .select(col("event_id"),
          to_json(struct(
            col("event_type").as("t"),
            get_json_object(col("props"), "$.k").cast("long").as("k"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
              .as("v_cents"))).as("payload"))
        .orderBy(col("event_id")),
    Some("""
      SELECT event_id,
             to_json(struct_pack(
               t := event_type,
               k := CAST(json_extract(props, '$.k') AS BIGINT),
               v_cents := CAST(floor(value * 100 + 0.5) AS BIGINT)))
               AS payload
      FROM events WHERE event_id < 100 ORDER BY event_id"""))

  /** Spark 4 VARIANT path (the current-generation semi-structured
    * type, vs q18's schema-on-read from_json): a nested JSON doc is
    * assembled per event (meta object + array — integers only, so
    * the text is byte-identical cross-engine), parsed ONCE to a
    * VARIANT, and fields come out through `variant_get` typed paths
    * (object step, nested step, array index). The oracle re-derives
    * the same values from the generation columns plus DuckDB's JSON
    * extraction — any path/typing defect in the variant walk breaks
    * the hash. Aggregated per event_type so the hashed surface stays
    * compact while every row exercises the extraction.
    *
    * Hardening (round 5): the JSON text is built with
    * `to_json(struct(...))`, never string concat — concat goes NULL
    * if ANY field is NULL (a missing `$.k` would silently reroute
    * the row into a NULL-vtype group the oracle doesn't have) and
    * does not escape quotes/backslashes in event_type. to_json
    * escapes correctly and renders a NULL field as JSON null, so a
    * missing k degrades to a NULL `ks[1]` that both engines' SUMs
    * skip identically. The oracle CASTs its integer SUMs to BIGINT:
    * DuckDB's SUM(BIGINT) is HUGEINT, which arrives as float64 on
    * the comparison side and hash-diverges from Spark's long even
    * when values are equal. */
  val q124 = Qry(
    "q124_variant_json",
    (s: SparkSession, d: String) => {
      val k = get_json_object(col("props"), "$.k").cast("long")
      val js = to_json(struct(
        struct(col("event_type").as("type"),
          col("user_id").as("uid")).as("meta"),
        array(k, k + 1).as("ks")))
      Tables.events(s, d)
        .withColumn("v", parse_json(js))
        .select(
          expr("variant_get(v, '$.meta.type', 'string')").as("vtype"),
          expr("variant_get(v, '$.meta.uid', 'long')").as("uid"),
          expr("variant_get(v, '$.ks[1]', 'long')").as("k2"))
        .groupBy(col("vtype"))
        .agg(count(lit(1)).as("n"),
          sum(col("uid")).as("sum_uid"),
          sum(col("k2")).as("sum_k2"))
        .orderBy(col("vtype"))
    },
    Some("""
      SELECT event_type AS vtype,
             COUNT(*) AS n,
             CAST(SUM(user_id) AS BIGINT) AS sum_uid,
             CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT) + 1)
               AS BIGINT) AS sum_k2
      FROM events GROUP BY event_type ORDER BY vtype"""))

  val all: Seq[Qry] = Seq(q18, q19, q20, q21, q22, q23, q124)
}
