"""Scalar function-family queries (SURVEY.md section 2.2): string, date,
math, array, map/JSON families. The reference's only scalar functions are
the type-encode visitors (timestamp format, base64 —
PartitionedJsonDecoder.java:163-253); these queries cover the full surface
an analytics user expects, each hash-checked against DuckDB.

Cross-engine parity notes (empirically probed):
- DuckDB dayofweek() is 0-based Sunday; Spark's is 1-based -> oracle adds 1.
- round() on DECIMAL agrees (half-up); raw-double round is avoided.
- exp/ln are excluded: libm last-ulp differences across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_export_spark.registry import register
from hive_export_spark.sources import load_table


@register(
    "fn_string_family",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS name_upper,
       lower(c_mktsegment) AS seg_lower,
       substr(c_name, 1, 8) AS name_prefix,
       length(c_name) AS name_len,
       c_name || '#' || c_mktsegment AS name_seg,
       replace(c_name, 'Customer', 'Cust') AS name_replaced,
       regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
       trim(' ' || c_name || ' ') AS name_trimmed,
       levenshtein(c_mktsegment, 'BUILDING') AS seg_lev
FROM customer
""",
    doc="string family: case, substring, concat, replace, regexp_extract, "
    "pad, trim, levenshtein. Oracle concatenation uses || (DuckDB "
    "concat() SKIPS NULL args where Spark concat NULL-propagates — "
    "round-9 all-NULL sweep; || NULL-propagates on both engines).",
)
def fn_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("name_seg"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_replaced"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("name_trimmed"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("seg_lev"),
    )


@register(
    "fn_date_family",
    oracle="""
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       dayofweek(o_orderdate) + 1 AS dow,
       strftime(o_orderdate, '%Y-%m-%d') AS date_str,
       datediff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
       CASE WHEN o_orderdate + INTERVAL 30 DAY > TIMESTAMP '9999-12-31 23:59:59'
            THEN NULL ELSE o_orderdate + INTERVAL 30 DAY END AS due_date,
       CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter_start
FROM orders
""",
    doc="date family: trunc, extract, format, diff, interval arithmetic "
    "(dayofweek numbering reconciled: DuckDB 0-based, Spark 1-based). "
    "Calendar arithmetic that exits the 4-digit-year domain pins NULL "
    "on both engines: a sentinel 'never' date (9999-12-31) + 30 days "
    "is computable in BOTH engines' internals but unrepresentable in "
    "Python datetime, so it dies at the driver's collect — the domain "
    "guard is explicit, not an engine accident (round-7 wave 8).",
)
def fn_date_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    due = F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    ts_max = F.lit("9999-12-31 23:59:59").cast("timestamp")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
        F.datediff(
            F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate")
        ).alias("days_to_y2k"),
        F.when(due <= ts_max, due).alias("due_date"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
    )


@register(
    "fn_math_family",
    oracle="""
SELECT p_partkey,
       abs(p_retailprice - 1000) AS price_dev,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(round(CAST(p_retailprice AS DECIMAL(12,2)) / 10, 1) AS DOUBLE) AS price_tenth,
       sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
       pow(CAST(p_size AS DOUBLE), 2) AS size_sq,
       p_size % 7 AS size_mod,
       CAST(sign(p_retailprice - 1000) AS INTEGER) AS price_sign,
       greatest(p_size, 25) AS size_floor25,
       least(p_size, 25) AS size_cap25
FROM part
""",
    doc="math family: abs/ceil/floor/round(decimal)/sqrt/pow/mod/sign/"
    "greatest/least",
)
def fn_math_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000).alias("price_dev"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.floor("p_retailprice").alias("price_floor"),
        F.round(F.col("p_retailprice").cast("decimal(12,2)") / 10, 1)
        .cast("double")
        .alias("price_tenth"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        F.pow(F.col("p_size").cast("double"), 2).alias("size_sq"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.signum(F.col("p_retailprice") - 1000).cast("int").alias("price_sign"),
        F.greatest("p_size", F.lit(25)).alias("size_floor25"),
        F.least("p_size", F.lit(25)).alias("size_cap25"),
    )


@register(
    "fn_array_family",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       string_split(text, ' ')[1] AS first_token,
       list_contains(string_split(text, ' '), 'spark') AS has_spark,
       array_to_string(list_transform(string_split(substr(text, 1, 40), ' '),
                                      t -> upper(t)), ',') AS head_upper
FROM documents
""",
    doc="array family: split, length, index, contains, transform "
    "(higher-order function), join — all JVM-side, no Python UDFs",
)
def fn_array_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        toks.getItem(0).alias("first_token"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(
            F.transform(F.split(F.substring("text", 1, 40), " "), lambda t: F.upper(t)),
            ",",
        ).alias("head_upper"),
    )


@register(
    "fn_json_family",
    oracle="""
SELECT event_id,
       CASE WHEN json_valid(props)
             AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
            THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
            END AS k_value,
       CASE WHEN json_valid(props)
            THEN json_extract_string(props, '$.k') END AS k_string,
       CAST(to_json(struct_pack(id := event_id, t := event_type)) AS VARCHAR) AS packed
FROM events
""",
    doc="JSON family: path extraction (typed + string) and struct->JSON "
    "(the reference's R5 encode generalized; from_json is exercised in "
    "streaming queries). Malformed/truncated props yield NULL "
    "extractions on both engines (Spark's PERMISSIVE parse vs a "
    "json_valid guard over DuckDB's raising json_extract — hostile "
    "sweep). Mistyped k (string/float/bool/array — wave-6 rows) pins "
    "NULL for the typed extraction: from_json IntegerType accepts only "
    "JSON integer tokens in range, mirrored by the json_type "
    "BIGINT/UBIGINT guard + TRY_CAST. Known leniency gaps kept out of "
    "the pinned domain: Spark's Jackson accepts a valid root value "
    "with TRAILING GARBAGE ('{..}x') and DUPLICATE KEYS (first wins) "
    "where DuckDB's json_valid rejects the former and dedupes the "
    "latter silently. NULL struct fields are EMITTED as JSON null "
    "(ignoreNullFields=false) — Spark's default silently omits the "
    "key where DuckDB's struct to_json keeps it (round-7 NULL-key "
    "wave), and the reference's R5 row encoder emits nulls "
    "(HiveExportClient.java field loop writes every schema column).",
)
def fn_json_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    props_schema = T.StructType([T.StructField("k", T.IntegerType())])
    return ev.select(
        "event_id",
        F.from_json("props", props_schema).getField("k").alias("k_value"),
        F.get_json_object("props", "$.k").alias("k_string"),
        F.to_json(
            F.struct(
                F.col("event_id").alias("id"), F.col("event_type").alias("t")
            ),
            {"ignoreNullFields": "false"},
        ).alias("packed"),
    )


@register(
    "fn_conditional_family",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_decoded,
       (o_totalprice BETWEEN 50000 AND 150000) AS mid_range,
       (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS is_urgent
FROM orders
""",
    doc="conditional family: CASE/WHEN, coalesce, nullif, BETWEEN, IN",
)
def fn_conditional_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_decoded"
        ),
        F.col("o_totalprice").between(50000, 150000).alias("mid_range"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_urgent"),
    )


@register(
    "fn_explode_unnest",
    oracle="""
SELECT doc_id, unnest(string_split(substr(text, 1, 30), ' ')) AS token
FROM documents WHERE doc_id < 100
""",
    doc="explode/unnest: one output row per array element (generator, "
    "pipelined — no shuffle)",
)
def fn_explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.explode(F.split(F.substring("text", 1, 30), " ")).alias("token"),
    )


@register(
    "fn_hash_family",
    oracle="""
SELECT doc_id,
       md5(text) AS text_md5,
       sha256(text) AS text_sha256
FROM documents
""",
    doc="deterministic content hashing (dedup fingerprint primitive)",
)
def fn_hash_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@register(
    "fn_map_family",
    oracle="""
SELECT event_id,
       element_at(m, 'type')[1] AS type_val,
       cardinality(m) AS m_size,
       array_to_string(map_keys(m), ',') AS keys_joined
FROM (
  SELECT event_id, MAP(['type', 'uid'],
                       [event_type, CAST(user_id AS VARCHAR)]) AS m
  FROM events
)
""",
    doc="map family: create_map, element_at, size, map_keys (MapType is "
    "native Spark — beyond the reference's flat-relational model, "
    "SURVEY.md section 1.3)",
)
def fn_map_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("type_val"),
        F.size(m).alias("m_size"),
        F.array_join(F.map_keys(m), ",").alias("keys_joined"),
    )


@register(
    "fn_try_family",
    oracle="""
SELECT o_orderkey,
       o_totalprice / (o_custkey % 5) AS safe_div,
       try_cast(o_orderpriority AS INTEGER) AS bad_cast,
       try_cast(CAST(o_custkey AS VARCHAR) AS INTEGER) AS good_cast,
       (string_split(o_orderpriority, '-'))[5] AS oob_element
FROM orders
""",
    doc="ANSI-safe function family: try_divide/try_cast/try_element_at — "
    "null instead of runtime error (ANSI mode is ON by default in Spark 4; "
    "DuckDB's /, casts and list indexing are natively null-on-error). "
    "Even the 'good' numeric-string cast goes through try_cast: a "
    "custkey above 2^31 turns the plain INT cast into a runtime "
    "CAST_INVALID_INPUT at realistic scale factors (round-6 hostile "
    "sweep) — NULL-on-overflow is the pinned cross-engine behavior.",
)
def fn_try_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 5).alias("safe_div"),
        F.try_to_number(F.col("o_orderpriority"), F.lit("999")).cast("int").alias("bad_cast"),
        F.expr("try_cast(cast(o_custkey as string) as int)").alias("good_cast"),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(5)).alias("oob_element"),
    )


@register(
    "fn_posexplode",
    oracle="""
SELECT doc_id,
       generate_subscripts(toks, 1) AS pos,
       unnest(toks) AS token
FROM (SELECT doc_id, string_split(substr(text, 1, 30), ' ') AS toks
      FROM documents WHERE doc_id < 50)
""",
    doc="posexplode: one row per element with its ordinal (1-based to "
    "match SQL subscripts)",
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 50)
    exploded = d.select(
        "doc_id",
        F.posexplode(F.split(F.substring("text", 1, 30), " ")).alias("pos0", "token"),
    )
    return exploded.select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "token"
    )


@register(
    "fn_string_extra",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_name IS NULL THEN NULL
            ELSE split_part(c_name, '#', 2) END AS name_num,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
       reverse(c_mktsegment) AS seg_reversed,
       repeat(substr(c_mktsegment, 1, 2), 2) AS seg_doubled,
       starts_with(c_name, 'Customer') AS is_customer,
       contains(c_mktsegment, 'ING') AS has_ing
FROM customer
""",
    doc="string family 2: split_part, translate, reverse, repeat, "
    "starts_with, contains. Oracle guards split_part with a NULL CASE "
    "(DuckDB split_part returns '' on NULL input where Spark "
    "NULL-propagates — round-9 all-NULL sweep).",
)
def fn_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.reverse("c_mktsegment").alias("seg_reversed"),
        F.repeat(F.substring("c_mktsegment", 1, 2), 2).alias("seg_doubled"),
        F.startswith(F.col("c_name"), F.lit("Customer")).alias("is_customer"),
        F.contains(F.col("c_mktsegment"), F.lit("ING")).alias("has_ing"),
    )


@register(
    "fn_regexp_family",
    oracle="""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-z]+a[a-z]*')) AS BIGINT)
         AS n_a_words,
       CASE WHEN text IS NULL THEN NULL
            ELSE COALESCE(array_to_string(regexp_extract_all(text, '\\b[a-z]{6,}\\b'), '|'), '')
            END AS long_words,
       CASE WHEN regexp_matches(text, 'table.*table') THEN 1 ELSE 0 END
         AS has_double_table,
       regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled
FROM documents
""",
    doc="regexp family beyond extract: match-count "
    "(regexp_count/len(extract_all)), extract-all joined to a scalar "
    "(arrays stay out of driver outputs), boolean rlike, global "
    "replace. Patterns restricted to the Java-regex/RE2 common subset "
    "(classes, quantifiers, word boundaries) — engine dialects diverge "
    "beyond it. The joined-extract column pins BOTH edge conventions: "
    "zero matches -> '' (DuckDB array_to_string([]) is NULL, Spark "
    "array_join([]) is ''), NULL text -> NULL (NULL-wave hostile "
    "sweep).",
)
def fn_regexp_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("[a-z]+a[a-z]*")).cast("bigint").alias(
            "n_a_words"
        ),
        F.array_join(
            F.regexp_extract_all("text", F.lit(r"\b[a-z]{6,}\b"), 0), "|"
        ).alias("long_words"),
        F.when(F.col("text").rlike("table.*table"), 1).otherwise(0).alias(
            "has_double_table"
        ),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
    )


@register(
    "fn_bitwise_family",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS band,
       o_orderkey | 4096 AS bor,
       xor(o_orderkey, 1365) AS bxor,
       CAST(o_orderkey << 3 AS BIGINT) AS shl,
       CAST(o_orderkey >> 2 AS BIGINT) AS shr,
       bit_count(o_orderkey) AS popcnt,
       o_orderkey % 16 AS lowbits
FROM orders WHERE o_orderkey <= 2000
""",
    doc="bitwise function family (and/or/xor, shifts, popcount): the "
    "primitives under every hash-partitioner, bitmap index, bloom probe "
    "and SimHash distance in the engine — all JVM codegen, shown "
    "matching DuckDB bit semantics on 64-bit integers.",
)
def fn_bitwise_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") <= 2000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(F.lit(1365)).alias("bxor"),
        F.expr("CAST(shiftleft(o_orderkey, 3) AS BIGINT)").alias("shl"),
        F.expr("CAST(shiftright(o_orderkey, 2) AS BIGINT)").alias("shr"),
        F.bit_count(k).alias("popcnt"),
        (k % 16).alias("lowbits"),
    )


@register(
    "fn_variant_family",
    oracle="""
SELECT event_id,
       event_type AS vtype,
       CAST(value AS DOUBLE) AS vvalue,
       event_id AS vid1,
       CASE WHEN json_valid(props) THEN
         CASE
           WHEN json_type(props, '$.k') = 'BOOLEAN'
             THEN CASE json_extract_string(props, '$.k')
                       WHEN 'true' THEN 1 WHEN 'false' THEN 0 END
           WHEN json_type(props, '$.k') IN ('BIGINT', 'UBIGINT', 'DOUBLE')
             THEN CASE WHEN trunc(TRY_CAST(json_extract_string(props, '$.k')
                                           AS DOUBLE))
                            BETWEEN -2147483648 AND 2147483647
                       THEN CAST(trunc(TRY_CAST(
                              json_extract_string(props, '$.k') AS DOUBLE))
                            AS BIGINT) END
           WHEN json_type(props, '$.k') = 'VARCHAR'
             THEN CASE WHEN regexp_matches(
                              trim(json_extract_string(props, '$.k')),
                              '^[+-]?[0-9]+$')
                        AND TRY_CAST(trim(json_extract_string(props, '$.k'))
                                     AS BIGINT)
                            BETWEEN -2147483648 AND 2147483647
                       THEN TRY_CAST(trim(json_extract_string(props, '$.k'))
                                     AS BIGINT) END
         END
       END AS k
FROM events
""",
    doc="VARIANT type family (parse_json / variant_get, Spark 4): "
    "semi-structured rows parsed once into the binary variant encoding, "
    "fields then extracted with typed paths ('$.meta.value', "
    "'$.ids[1]') — the modern replacement for per-field "
    "get_json_object re-parsing (one parse, many typed reads; variant "
    "shreds into columnar form under the hood). The JSON is built from "
    "fixture columns so the oracle can verify the typed extractions "
    "against the raw columns directly; props.k exercises a real stored "
    "JSON column through the same path.",
)
def fn_variant_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    j = F.to_json(
        F.struct(
            F.col("event_id"),
            F.struct(F.col("event_type"), F.col("value")).alias("meta"),
            F.array(F.col("user_id"), F.col("event_id")).alias("ids"),
        )
    )
    parsed = ev.select(
        "event_id",
        F.parse_json(j).alias("__v"),
        # try_parse_json: ANSI parse_json raises MALFORMED_RECORD on a
        # truncated props string from a broken upstream writer; NULL on
        # malformed is the pinned cross-engine convention (hostile sweep)
        F.expr("try_parse_json(props)").alias("__pv"),
    )
    return parsed.select(
        "event_id",
        F.expr("variant_get(__v, '$.meta.event_type', 'string')").alias("vtype"),
        F.expr("variant_get(__v, '$.meta.value', 'double')").alias("vvalue"),
        F.expr("variant_get(__v, '$.ids[1]', 'bigint')").alias("vid1"),
        # try_variant_get, not variant_get: a props.k the writer mistyped
        # (string 'café', array) raises INVALID_VARIANT_CAST under ANSI —
        # NULL-on-degenerate is the pinned convention. The oracle mirrors
        # the variant INT cast per the round-8 engine probe: JSON boolean
        # -> 1/0 (json_type-guarded: a string 'true' is NULL here, not 1
        # — r7 driver advisory #2), numerics truncated toward zero AND
        # int32-range-checked ('int' is 32-bit; 2147483648 -> NULL),
        # strings parsed only as integral decimals with optional
        # sign/whitespace ('3' -> 3 but '3.7'/'3e2'/'0x10' -> NULL,
        # where a bare DuckDB TRY_CAST would accept the latter two).
        F.expr("CAST(try_variant_get(__pv, '$.k', 'int') AS BIGINT)").alias("k"),
    )


@register(
    "fn_higher_order_family",
    oracle="""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
)
SELECT vec_id,
       CAST(round(CASE WHEN e IS NULL OR len(e) = 0 THEN NULL
                       ELSE list_reduce(e, (acc, x) -> acc + x) END, 6)
            AS DOUBLE) AS s,
       CAST(round(CASE WHEN e IS NULL OR len(e) = 0 THEN NULL
                       ELSE sqrt(list_reduce(
           list_transform(list_zip(e, e), p -> p[1] * p[2]),
           (acc, x) -> acc + x)) END, 6) AS DOUBLE) AS l2,
       len(list_filter(e, x -> x < 0)) > 0 AS any_neg,
       len(list_filter(e, x -> NOT abs(x) < 1000000.0)) = 0 AS all_finite,
       CAST(len(list_filter(e, x -> x > 0)) AS INTEGER) AS n_pos
FROM base
""",
    doc="higher-order array function family over the embedding column: "
    "aggregate (left fold), zip_with (pairwise product for the L2 "
    "norm), exists, forall, filter — the lambda calculus Spark executes "
    "ENTIRELY in the JVM inside codegen (no UDF, no Python worker), "
    "which is why vector math over array columns is a map-only, "
    "shuffle-free pass at any corpus size. Both engines fold "
    "left-to-right over the same element order, so the double sums are "
    "bit-identical before the guard round(6); boolean/int outputs are "
    "exact. DuckDB mirrors with list_reduce / list_zip / list_filter. "
    "NULL/empty vectors (failed embed jobs) yield NULL folds on BOTH "
    "sides — pinned explicitly because the engines' natural behaviors "
    "diverge three ways (Spark aggregate returns the seed on [], "
    "DuckDB list_reduce raises on [] and on NULL input lists; "
    "NULL-wave hostile sweep).",
)
def fn_higher_order_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    degenerate = F.col("e").isNull() | (F.size("e") == 0)
    return emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"),
    ).select(
        "vec_id",
        F.when(degenerate, F.lit(None).cast("double")).otherwise(
            F.round(
                F.expr("aggregate(e, 0D, (acc, x) -> acc + x)"), 6
            ).cast("double")
        ).alias("s"),
        F.when(degenerate, F.lit(None).cast("double")).otherwise(
            F.round(
                F.sqrt(
                    F.expr(
                        "aggregate(zip_with(e, e, (x, y) -> x * y), 0D,"
                        " (acc, x) -> acc + x)"
                    )
                ),
                6,
            ).cast("double")
        ).alias("l2"),
        F.expr("exists(e, x -> x < 0)").alias("any_neg"),
        F.expr("forall(e, x -> abs(x) < 1000000.0D)").alias("all_finite"),
        F.expr("size(filter(e, x -> x > 0))").cast("int").alias("n_pos"),
    )


@register(
    "fn_xpath_family",
    oracle="""
SELECT doc_id,
       CASE WHEN lang IS NULL OR n_chars IS NULL THEN NULL
            ELSE lang END AS x_lang,
       CASE WHEN lang IS NULL OR n_chars IS NULL THEN NULL
            ELSE n_chars END AS x_chars,
       CASE WHEN lang IS NULL OR n_chars IS NULL THEN NULL
            ELSE CAST(doc_id AS VARCHAR) END AS x_id_attr
FROM documents
""",
    doc="XPath function family (xpath_string / xpath_long over embedded "
    "XML): construct a well-formed XML fragment per row from typed "
    "columns, then extract element text, a numeric element, and an "
    "attribute back out — the construct-then-parse identity pattern "
    "(same as the serde round-trips), so the oracle is the plain "
    "source projection and any extraction bug breaks the hash. The "
    "XPath evaluation is JVM-side codegen (no UDF); inputs are "
    "XML-safe by schema (ids and language codes). A row with ANY "
    "NULL field serializes to a NULL fragment (concat semantics) and "
    "every extraction is NULL — mirrored in the oracle's CASE "
    "(NULL-wave hostile sweep).",
)
def fn_xpath_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    xml = F.concat(
        F.lit('<doc id="'),
        F.col("doc_id").cast("string"),
        F.lit('"><lang>'),
        F.col("lang"),
        F.lit("</lang><n>"),
        F.col("n_chars").cast("string"),
        F.lit("</n></doc>"),
    )
    return d.withColumn("__xml", xml).select(
        "doc_id",
        F.expr("xpath_string(__xml, '/doc/lang')").alias("x_lang"),
        F.expr("xpath_long(__xml, '/doc/n')").alias("x_chars"),
        F.expr("xpath_string(__xml, '/doc/@id')").alias("x_id_attr"),
    )


@register(
    "fn_csv_serde_family",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_returnflag AS c_flag,
       CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS c_qty
FROM lineitem
""",
    doc="CSV serde function family (to_csv / from_csv as expressions, "
    "not file formats): rows serialize to CSV text and parse back "
    "with an explicit schema inside one JVM-side projection — the "
    "embedded-CSV-column shape (e.g. a CSV payload field inside an "
    "exported stream). Identity oracle; decimal-through-text keeps "
    "the quantity exact both ways.",
)
def fn_csv_serde_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    csv = F.to_csv(
        F.struct(
            F.col("l_orderkey"),
            F.col("l_linenumber"),
            F.col("l_returnflag"),
            F.col("l_quantity").cast("decimal(12,2)").alias("q"),
        )
    )
    parsed = F.from_csv(
        csv, "k BIGINT, ln INT, flag STRING, q DECIMAL(12,2)"
    )
    return li.withColumn("__p", parsed).select(
        F.col("__p.k").alias("l_orderkey"),
        F.col("__p.ln").alias("l_linenumber"),
        F.col("__p.flag").alias("c_flag"),
        F.col("__p.q").cast("double").alias("c_qty"),
    )


@register(
    "fn_explode_outer",
    oracle="""
WITH arr AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(lower(text)),
                                                 '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '),
                     t -> length(t) >= 7) AS longs
  FROM documents
)
SELECT doc_id,
       unnest(CASE WHEN longs IS NULL OR len(longs) = 0
                   THEN [NULL] ELSE longs END)
         AS long_term
FROM arr
""",
    doc="explode_outer semantics: generate one row per array element but "
    "KEEP rows whose array is empty (emitting NULL) — the LEFT OUTER "
    "LATERAL VIEW shape, vs plain explode which silently drops "
    "empty-array parents (a classic row-loss bug in flattening "
    "pipelines). Filtered to 7+-char tokens so a meaningful fraction "
    "of documents genuinely produce the empty case. DuckDB mirrors "
    "with a CASE-wrapped [NULL] sentinel since its unnest drops "
    "empties like plain explode; the sentinel also covers NULL-text "
    "rows, whose NULL token array explode_outer keeps as a NULL row "
    "just like the empty case (NULL-wave hostile sweep).",
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    longs = F.filter(F.split(norm, " "), lambda t: F.length(t) >= 7)
    return d.select(
        "doc_id", F.explode_outer(longs).alias("long_term")
    )


@register(
    "fn_printf_family",
    oracle="""
SELECT doc_id,
       printf('doc-%05d', doc_id) AS padded_id,
       printf('%s/%d chars', lang, n_chars) AS summary,
       printf('%08.2f', CAST(n_chars AS DOUBLE) / 7) AS ratio_str,
       lpad(lang, 6, '.') AS lang_pad,
       rpad(source, 8, '-') AS source_pad
FROM documents
""",
    doc="printf-style formatting family (format_string == DuckDB "
    "printf) plus lpad/rpad: the deterministic string-rendering "
    "surface export pipelines use for fixed-width ids and log lines. "
    "The %08.2f float case renders a double both engines computed "
    "identically (exact integer / literal), so even float formatting "
    "is hash-stable. Pure projection, zero shuffle. NULL args are "
    "pinned NULL-propagating: Java-style format_string renders the "
    "text 'null' where DuckDB printf yields NULL (NULL-wave hostile "
    "sweep), so each format is guarded on its inputs.",
)
def fn_printf_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)

    def fmt_nn(fmt, *cols):
        guard = F.lit(True)
        for c in cols:
            guard = guard & c.isNotNull()
        return F.when(guard, F.format_string(fmt, *cols))

    return d.select(
        "doc_id",
        fmt_nn("doc-%05d", F.col("doc_id")).alias("padded_id"),
        fmt_nn("%s/%d chars", F.col("lang"), F.col("n_chars")).alias(
            "summary"
        ),
        fmt_nn(
            "%08.2f", F.col("n_chars").cast("double") / 7
        ).alias("ratio_str"),
        F.lpad("lang", 6, ".").alias("lang_pad"),
        F.rpad("source", 8, "-").alias("source_pad"),
    )


@register(
    "fn_interval_family",
    oracle="""
SELECT o_orderkey,
       CASE WHEN CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) > DATE '9999-12-31'
            THEN NULL
            ELSE CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR)
            END AS plus_3mo,
       CAST(CAST(o_orderdate - INTERVAL 45 DAY AS DATE) AS VARCHAR) AS minus_45d,
       CAST(last_day(o_orderdate) AS VARCHAR) AS month_end,
       CAST(datediff('day', o_orderdate, last_day(o_orderdate)) AS BIGINT) AS days_left_in_month,
       CAST(make_date(CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER), 15) AS VARCHAR) AS mid_month,
       CAST(floor(datediff('day', DATE '1992-01-01', o_orderdate) / 7) AS BIGINT) AS weeks_since_92
FROM orders
""",
    doc="date/interval arithmetic family: calendar-month addition with "
    "end-of-month clamping (add_months / + INTERVAL MONTH agree on the "
    "clamp), day-interval subtraction, last_day, component "
    "reassembly via make_date, and integer week bucketing computed as "
    "floor(day-diff / 7) on BOTH sides (never an engine 'weeks' "
    "datediff, whose week-boundary conventions differ). Every "
    "date-typed result is rendered as an ISO yyyy-MM-dd string so the "
    "driver compares plain strings, not engine date encodings. Pure "
    "per-row projection — map-only at any scale, pushdown-friendly. "
    "Month addition that exits the 4-digit-year domain (sentinel "
    "9999-12-31 'never' date + 3 months) pins NULL on both engines: "
    "both compute year 10000 internally but render it differently "
    "('+10000-...' via the JVM formatter vs '10000-...'), and the "
    "value is outside Python datetime anyway (round-7 wave 8).",
)
def fn_interval_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    d = F.col("o_orderdate")
    iso = "yyyy-MM-dd"
    plus_3mo = F.add_months(d, 3)
    return o.select(
        "o_orderkey",
        F.when(
            plus_3mo <= F.lit("9999-12-31").cast("date"),
            F.date_format(plus_3mo, iso),
        ).alias("plus_3mo"),
        F.date_format(F.date_sub(d, 45), iso).alias("minus_45d"),
        F.date_format(F.last_day(d), iso).alias("month_end"),
        F.datediff(F.last_day(d), d).cast("bigint").alias("days_left_in_month"),
        F.date_format(
            F.make_date(F.year(d), F.month(d), F.lit(15)), iso
        ).alias("mid_month"),
        F.floor(F.datediff(d, F.lit("1992-01-01").cast("date")) / 7)
        .cast("bigint")
        .alias("weeks_since_92"),
    )


@register(
    "fn_struct_family",
    oracle="""
WITH s AS (
  SELECT o_orderkey,
         struct_pack(status := o_orderstatus,
                     price_cents := CAST(round(o_totalprice * 100) AS BIGINT)) AS st
  FROM orders
)
SELECT o_orderkey,
       st.price_cents AS price_from_struct,
       struct_pack(k := o_orderkey, inner_s := st).inner_s.status AS status_nested,
       to_json(st)::VARCHAR AS packed,
       -- IS NOT DISTINCT FROM: Spark struct equality is null-safe
       -- member-wise (NULL == NULL inside a struct reads TRUE) where
       -- DuckDB row equality NULL-propagates; identical on structs with
       -- no NULL members (round-9 all-NULL sweep)
       st IS NOT DISTINCT FROM
         struct_pack(status := st.status, price_cents := st.price_cents)
         AS eq_ok
FROM s
""",
    doc="struct/row-type function family: named-struct construction, "
    "field access, nested struct traversal, struct-to-JSON "
    "serialization (field order and number formatting agree across "
    "engines for integer/string members — floats are kept OUT of the "
    "JSON payload on purpose), and whole-struct equality. Money goes "
    "through round(x*100) to integer cents BEFORE entering the "
    "struct so every struct member is exactly representable. Pure "
    "per-row projection, map-only at any scale.",
)
def fn_struct_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    st = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("price_cents"),
    )
    s = o.select("o_orderkey", st.alias("st"))
    rebuilt = F.struct(
        F.col("st.status").alias("status"),
        F.col("st.price_cents").alias("price_cents"),
    )
    nested = F.struct(F.col("o_orderkey").alias("k"), F.col("st").alias("inner_s"))
    return s.select(
        "o_orderkey",
        F.col("st.price_cents").alias("price_from_struct"),
        nested.getField("inner_s").getField("status").alias("status_nested"),
        # ignoreNullFields false: Spark to_json OMITS null struct fields
        # by default where DuckDB emits "k":null (wave-7 convention,
        # re-hit by the round-9 all-NULL sweep on this query)
        F.to_json("st", {"ignoreNullFields": "false"}).alias("packed"),
        (F.col("st") == rebuilt).alias("eq_ok"),
    )
