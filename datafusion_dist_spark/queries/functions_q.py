"""Scalar-function surface sampler (SURVEY §2.C 'Scalar functions').

The reference inherits its entire scalar library from the DataFusion
dependency without exercising it in tests; SURVEY directs us to pin a
representative sample anyway. Everything here is a built-in
``pyspark.sql.functions`` call — JVM-side, inside whole-stage codegen;
no Python in the hot path.

Cross-engine note: transcendental functions (ln/exp/sqrt) may differ in
the last ulp between JVM Math and libm → results rounded to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_dist_spark.catalog import load_table
from datafusion_dist_spark.registry import register, register_sql


@register(
    "fn_string",
    oracle="""
        SELECT p_partkey,
               lower(p_name) AS name_lc,
               upper(p_brand) AS brand_uc,
               substr(p_name, 1, 5) AS name_pre,
               length(p_name) AS name_len,
               replace(p_type, ' ', '_') AS type_us,
               concat(p_brand, ':', p_type) AS brand_type,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
               trim('  ' || p_brand || ' ') AS brand_trim,
               reverse(p_brand) AS brand_rev,
               len(str_split(p_name, ' ')) AS n_words
        FROM part WHERE p_partkey < 100
    """,
    doc="String functions: lower/upper/substr/length/replace/concat/"
    "lpad/trim/reverse/split.",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lc"),
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_name", 1, 5).alias("name_pre"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
        F.reverse("p_brand").alias("brand_rev"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_words"),
    )


@register(
    "fn_math",
    oracle="""
        SELECT s_suppkey,
               abs(CAST(ROUND(s_acctbal*100) AS BIGINT)) AS bal_abs_c,
               CAST(ceil(s_acctbal) AS BIGINT) AS bal_ceil,
               CAST(floor(s_acctbal) AS BIGINT) AS bal_floor,
               s_suppkey % 7 AS k_mod,
               CAST(power(s_suppkey, 2) AS BIGINT) AS k_sq,
               round(sqrt(CAST(s_suppkey AS DOUBLE)), 6) AS k_sqrt,
               round(ln(CAST(s_suppkey + 1 AS DOUBLE)), 6) AS k_ln,
               round(exp(CAST(s_suppkey % 5 AS DOUBLE)), 6) AS k_exp,
               CAST(sign(s_acctbal) AS BIGINT) AS bal_sign
        FROM supplier
    """,
    doc="Math functions: abs/ceil/floor/mod/power/sqrt/ln/exp/sign.",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.abs(F.round(F.col("s_acctbal") * 100).cast("bigint")).alias("bal_abs_c"),
        F.ceil("s_acctbal").cast("bigint").alias("bal_ceil"),
        F.floor("s_acctbal").cast("bigint").alias("bal_floor"),
        (F.col("s_suppkey") % 7).alias("k_mod"),
        F.pow("s_suppkey", F.lit(2)).cast("bigint").alias("k_sq"),
        F.round(F.sqrt(F.col("s_suppkey").cast("double")), 6).alias("k_sqrt"),
        F.round(F.log((F.col("s_suppkey") + 1).cast("double")), 6).alias("k_ln"),
        F.round(F.exp((F.col("s_suppkey") % 5).cast("double")), 6).alias("k_exp"),
        F.signum("s_acctbal").cast("bigint").alias("bal_sign"),
    )


@register(
    "fn_date",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS odate,
               CAST(year(o_orderdate) AS INTEGER) AS y,
               CAST(month(o_orderdate) AS INTEGER) AS m,
               CAST(day(o_orderdate) AS INTEGER) AS d,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               CAST(quarter(o_orderdate) AS INTEGER) AS q,
               CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                    AS INTEGER) AS days_since,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date
        FROM orders WHERE o_orderkey < 200
    """,
    doc="Date/time functions: year/month/day/quarter/date_trunc/"
    "datediff/date_add (timestamps cast to DATE for cross-engine hash).",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        od.cast("date").alias("odate"),
        F.year(od).alias("y"),
        F.month(od).alias("m"),
        F.dayofmonth(od).alias("d"),
        F.date_trunc("month", od).cast("date").alias("month_start"),
        F.quarter(od).alias("q"),
        F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
        F.date_add(od.cast("date"), 30).alias("due_date"),
    )


@register(
    "fn_conditional",
    oracle="""
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'debt'
                    WHEN c_acctbal < 5000 THEN 'mid'
                    ELSE 'rich' END AS tier,
               coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg,
               greatest(c_custkey % 10, c_nationkey % 10) AS hi,
               least(c_custkey % 10, c_nationkey % 10) AS lo,
               CASE WHEN c_custkey % 2 = 0 THEN 'even' ELSE 'odd' END AS parity
        FROM customer WHERE c_custkey < 300
    """,
    doc="Conditional expressions: CASE WHEN / coalesce / nullif / "
    "greatest / least.",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "debt").when(bal < 5000, "mid").otherwise("rich").alias("tier"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULT")
        ).alias("seg"),
        F.greatest(F.col("c_custkey") % 10, (F.col("c_nationkey") % 10).cast("bigint")).alias("hi"),
        F.least(F.col("c_custkey") % 10, (F.col("c_nationkey") % 10).cast("bigint")).alias("lo"),
        F.when(F.col("c_custkey") % 2 == 0, "even").otherwise("odd").alias("parity"),
    )


@register(
    "fn_cast",
    oracle="""
        SELECT l_orderkey,
               CAST(trunc(l_quantity) AS BIGINT) AS qty_int,
               CAST(l_orderkey AS VARCHAR) AS key_str,
               CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
               CAST(l_linenumber AS DOUBLE) AS line_dbl,
               TRY_CAST(l_returnflag AS INTEGER) AS bad_cast
        FROM lineitem WHERE l_orderkey < 50
    """,
    doc="Cast surface incl. failed cast → NULL (TRY_CAST; Spark "
    "non-ANSI cast matches).",
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 50)
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.col("l_returnflag").try_cast("int").alias("bad_cast"),
    )


@register(
    "fn_date_parts",
    oracle="""
        SELECT o_orderkey,
               CAST(isodow(o_orderdate) - 1 AS INTEGER) AS wd,
               CAST(weekofyear(o_orderdate) AS INTEGER) AS woy,
               CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
               CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start
        FROM orders WHERE o_orderkey < 150
    """,
    doc="Date-part surface: weekday (Monday=0) / ISO week / day-of-"
    "year / last_day / add_months / week truncation.",
)
def fn_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 150)
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.weekday(od).alias("wd"),
        F.weekofyear(od).alias("woy"),
        F.dayofyear(od).alias("doy"),
        F.last_day(od.cast("date")).alias("month_end"),
        F.add_months(od.cast("date"), 3).alias("plus3m"),
        F.date_trunc("week", od).cast("date").alias("week_start"),
    )


@register(
    "fn_string_extra",
    oracle="""
        SELECT p_partkey,
               translate(p_brand, '#', '-') AS brand_dash,
               repeat(left(p_type, 2), 3) AS type_rep,
               CAST(strpos(p_name, ' ') AS INTEGER) AS first_space,
               CAST(ascii(p_brand) AS INTEGER) AS first_code,
               chr(65 + CAST(p_partkey % 26 AS INTEGER)) AS letter,
               right(p_name, 4) AS name_tail,
               CASE WHEN contains(p_type, 'ANOD') THEN 1 ELSE 0 END AS has_anod,
               CASE WHEN starts_with(p_brand, 'Brand#1') THEN 1 ELSE 0 END AS b1,
               split_part(p_type, ' ', 1) AS type_head
        FROM part WHERE p_partkey < 120
    """,
    doc="String surface 2: translate / repeat / strpos / ascii / chr / "
    "right / contains / starts_with / split_part.",
)
def fn_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 120)
    return p.select(
        "p_partkey",
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.repeat(F.substring("p_type", 1, 2), 3).alias("type_rep"),
        F.instr("p_name", " ").alias("first_space"),
        F.ascii("p_brand").alias("first_code"),
        F.chr(F.lit(65) + (F.col("p_partkey") % 26).cast("int")).alias("letter"),
        F.substring("p_name", -4, 4).alias("name_tail"),
        F.col("p_type").contains("ANOD").cast("int").alias("has_anod"),
        F.startswith(F.col("p_brand"), F.lit("Brand#1")).cast("int").alias("b1"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
    )


@register(
    "fn_bits",
    oracle="""
        SELECT s_suppkey,
               s_suppkey & 15 AS b_and,
               s_suppkey | 16 AS b_or,
               xor(s_suppkey, 21) AS b_xor,
               s_suppkey << 2 AS b_shl,
               s_suppkey >> 1 AS b_shr,
               CAST(bit_count(s_suppkey) AS INTEGER) AS b_pop
        FROM supplier
    """,
    doc="Bitwise surface: and / or / xor / shifts / popcount.",
)
def fn_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    return s.select(
        "s_suppkey",
        k.bitwiseAND(15).alias("b_and"),
        k.bitwiseOR(16).alias("b_or"),
        k.bitwiseXOR(21).alias("b_xor"),
        F.shiftleft(k, 2).alias("b_shl"),
        F.shiftright(k, 1).alias("b_shr"),
        F.bit_count(k).alias("b_pop"),
    )


@register(
    "fn_misc",
    oracle="""
        SELECT p_partkey,
               greatest(p_size, 25) AS g,
               least(p_size, 25) AS l,
               coalesce(nullif(p_brand, 'Brand#1'), 'OTHER') AS brand_or_other,
               ifnull(nullif(p_size, 10), -1) AS size_not_10,
               CASE WHEN p_size BETWEEN 10 AND 20 THEN 1 ELSE 0 END AS mid_size
        FROM part WHERE p_partkey < 200
    """,
    doc="Conditional scalar surface: greatest / least / coalesce / "
    "nullif / ifnull / BETWEEN.",
)
def fn_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.greatest("p_size", F.lit(25)).alias("g"),
        F.least("p_size", F.lit(25)).alias("l"),
        F.coalesce(F.nullif("p_brand", F.lit("Brand#1")), F.lit("OTHER")).alias(
            "brand_or_other"
        ),
        F.ifnull(F.nullif("p_size", F.lit(10)), F.lit(-1)).alias("size_not_10"),
        F.col("p_size").between(10, 20).cast("int").alias("mid_size"),
    )


@register(
    "fn_map_ops",
    oracle="""
        SELECT n_nationkey,
               array_to_string(map_keys(map(['name','region'],
                   [n_name, CAST(n_regionkey AS VARCHAR)])), ',') AS ks,
               array_to_string(map_values(map(['name','region'],
                   [n_name, CAST(n_regionkey AS VARCHAR)])), ',') AS vs,
               map(['name','region'],
                   [n_name, CAST(n_regionkey AS VARCHAR)])['name'][1] AS name_val,
               CAST(cardinality(map(['name','region'],
                   [n_name, CAST(n_regionkey AS VARCHAR)])) AS INTEGER) AS n_entries
        FROM nation
    """,
    doc="Map-typed column surface: map_from_arrays construction, "
    "map_keys / map_values / element_at / size. Keys/values project as "
    "joined strings (raw map/array output columns are not value-"
    "hashable by the driver compare; DuckDB map extraction returns a "
    "1-element list, unwrapped with [1]).",
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    m = F.map_from_arrays(
        F.array(F.lit("name"), F.lit("region")),
        F.array(F.col("n_name"), F.col("n_regionkey").cast("string")),
    )
    return n.select(
        "n_nationkey",
        F.array_join(F.map_keys(m), ",").alias("ks"),
        F.array_join(F.map_values(m), ",").alias("vs"),
        F.element_at(m, "name").alias("name_val"),
        F.size(m).alias("n_entries"),
    )


@register(
    "fn_posexplode",
    oracle="""
        SELECT p_partkey, CAST(u.i AS INTEGER) AS pos,
               str_split(p_type, ' ')[u.i + 1] AS word
        FROM part, UNNEST(range(0, len(str_split(p_type, ' ')))) AS u(i)
        WHERE p_partkey < 150
    """,
    doc="posexplode / LATERAL VIEW with ordinality: one output row per "
    "array element with its position (generator stays partition-local, "
    "no shuffle).",
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 150)
    return p.select(
        "p_partkey",
        F.posexplode(F.split("p_type", " ")).alias("pos", "word"),
    )


@register(
    "fn_trig",
    oracle="""
        SELECT s_suppkey,
               round(sin(CAST(s_suppkey AS DOUBLE)), 6) AS v_sin,
               round(cos(CAST(s_suppkey AS DOUBLE)), 6) AS v_cos,
               round(atan2(CAST(s_suppkey AS DOUBLE), 7.0), 6) AS v_atan2,
               round(degrees(CAST(s_suppkey AS DOUBLE) / 100), 6) AS v_deg,
               round(radians(CAST(s_suppkey AS DOUBLE)), 6) AS v_rad,
               round(pi(), 6) AS v_pi
        FROM supplier
    """,
    doc="Trigonometric surface: sin / cos / atan2 / degrees / radians "
    "/ pi (IEEE correctly-rounded libm, stable at 6dp).",
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey").cast("double")
    return s.select(
        "s_suppkey",
        F.round(F.sin(k), 6).alias("v_sin"),
        F.round(F.cos(k), 6).alias("v_cos"),
        F.round(F.atan2(k, F.lit(7.0)), 6).alias("v_atan2"),
        F.round(F.degrees(k / 100), 6).alias("v_deg"),
        F.round(F.radians(k), 6).alias("v_rad"),
        F.round(F.lit(3.141592653589793), 6).alias("v_pi"),
    )


@register(
    "fn_try_arithmetic",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_linenumber - 3 = 0 THEN NULL
                    ELSE CAST(l_orderkey AS DOUBLE) / (l_linenumber - 3) END
                 AS safe_div,
               TRY_CAST(l_returnflag AS INTEGER) AS try_int,
               CASE WHEN l_linenumber = 0 THEN NULL
                    ELSE l_orderkey % nullif(l_linenumber, 0) END AS safe_mod
        FROM lineitem WHERE l_orderkey < 200
    """,
    doc="NULL-on-error arithmetic: try_divide / try_cast / "
    "nullif-guarded mod — permissive semantics matching DataFusion "
    "and DuckDB defaults (no ANSI aborts).",
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_orderkey").cast("double"), F.col("l_linenumber") - 3
        ).alias("safe_div"),
        F.col("l_returnflag").try_cast("int").alias("try_int"),
        (F.col("l_orderkey") % F.nullif("l_linenumber", F.lit(0))).alias("safe_mod"),
    )


@register(
    "fn_url",
    oracle="""
        WITH u AS (
            SELECT o_orderkey,
                   'https://api.example.com/v1/orders/' || o_orderkey
                   || '?status=' || o_orderstatus
                   || '&priority=' || replace(o_orderpriority, ' ', '%20')
                     AS url
            FROM orders WHERE o_orderkey % 97 = 0
        )
        SELECT o_orderkey,
               regexp_extract(url, 'https?://([^/?#]+)', 1) AS host,
               regexp_extract(url, 'https?://[^/?#]+([^?#]*)', 1) AS path,
               regexp_extract(url, '\\?([^#]*)', 1) AS query_string,
               regexp_extract(url, '[?&]status=([^&#]*)', 1) AS status,
               replace(regexp_extract(url, '[?&]priority=([^&#]*)', 1),
                       '%20', ' ') AS priority
        FROM u
    """,
    doc="URL parsing surface: parse_url HOST/PATH/QUERY, per-key query "
    "extraction, and url_decode round-trip over deterministically "
    "constructed (percent-encoded) URLs; the oracle re-parses the "
    "same strings with regexps, so Spark's parser is checked against "
    "an independent ground truth.",
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 97 == 0
    )
    url = F.concat(
        F.lit("https://api.example.com/v1/orders/"),
        F.col("o_orderkey").cast("string"),
        F.lit("?status="),
        F.col("o_orderstatus"),
        F.lit("&priority="),
        F.replace(F.col("o_orderpriority"), F.lit(" "), F.lit("%20")),
    )
    return o.select(
        "o_orderkey",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query_string"),
        F.parse_url(url, F.lit("QUERY"), F.lit("status")).alias("status"),
        F.url_decode(
            F.parse_url(url, F.lit("QUERY"), F.lit("priority"))
        ).alias("priority"),
    )


@register(
    "fn_calendar",
    oracle="""
        SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                 AS plus3m,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE)
                 AS quarter_start,
               CAST(week(CAST(o_orderdate AS DATE)) AS INTEGER) AS iso_week,
               CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INTEGER)
                 AS dow
        FROM orders WHERE o_orderkey < 500
    """,
    doc="Calendar arithmetic: add_months (end-of-month clamping — both "
    "engines clamp Jan 31 + 1 month to Feb 29), last_day, quarter "
    "truncation, ISO week number, day-of-week (aligned to Spark's "
    "1=Sunday convention).",
)
def fn_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus3m"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("quarter", d).cast("date").alias("quarter_start"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofweek(d).alias("dow"),
    )


@register(
    "fn_array_setops",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   string_split(lower(text), ' ') AS toks
            FROM documents WHERE doc_id < 40
        ),
        s AS (
            SELECT doc_id,
                   list_slice(toks, 1, 5) AS head5,
                   list_slice(toks, len(toks) - 4, len(toks)) AS tail5,
                   toks
            FROM t WHERE len(toks) >= 10
        )
        SELECT doc_id,
               array_to_string(
                   list_sort(list_distinct(list_concat(head5, tail5))), '|'
               ) AS u,
               coalesce(array_to_string(
                   list_sort(list_distinct(list_intersect(head5, tail5))), '|'
               ), '') AS i,
               coalesce(array_to_string(list_sort(list_distinct(
                   list_filter(head5, x -> NOT list_contains(tail5, x))
               )), '|'), '') AS e,
               CAST(coalesce(list_position(toks, 'data'), 0) AS BIGINT)
                   AS pos_data,
               array_to_string(range(1, 6), '|') AS seq5
        FROM s
    """,
    doc="Array set operations: union / intersect / except (sorted for "
    "order-insensitive cross-engine equality — the engines differ "
    "only in result ordering), element position with a 0-if-absent "
    "convention (Spark returns 0, DuckDB NULL — coalesced), and "
    "sequence generation; results array_join-scalarized for the "
    "hash compare. All JVM-side expressions, no shuffle.",
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    t = d.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("toks")
    ).filter(F.size("toks") >= 10)
    head5 = F.slice(F.col("toks"), 1, 5)
    tail5 = F.slice(F.col("toks"), F.size("toks") - 4, 5)
    s = t.select("doc_id", head5.alias("head5"), tail5.alias("tail5"), "toks")
    return s.select(
        "doc_id",
        F.array_join(F.sort_array(F.array_union("head5", "tail5")), "|").alias("u"),
        F.array_join(
            F.sort_array(F.array_intersect("head5", "tail5")), "|"
        ).alias("i"),
        F.array_join(F.sort_array(F.array_except("head5", "tail5")), "|").alias("e"),
        F.array_position("toks", "data").alias("pos_data"),
        F.array_join(F.sequence(F.lit(1), F.lit(5)), "|").alias("seq5"),
    )


register_sql(
    "fn_collation",
    spark_sql="""
        WITH t AS (
            SELECT p_partkey,
                   collate(p_type, 'UTF8_LCASE') AS type_ci,
                   p_type
            FROM part WHERE p_partkey <= 200
        )
        SELECT count(*) AS n_rows,
               count(DISTINCT type_ci) AS n_types_ci,
               count(DISTINCT p_type) AS n_types_cs,
               CAST(sum(CASE WHEN type_ci = 'medium' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_medium_ci
        FROM t
    """,
    oracle="""
        WITH t AS (
            SELECT p_partkey, lower(p_type) AS type_ci, p_type
            FROM part WHERE p_partkey <= 200
        )
        SELECT count(*) AS n_rows,
               count(DISTINCT type_ci) AS n_types_ci,
               count(DISTINCT p_type) AS n_types_cs,
               CAST(sum(CASE WHEN type_ci = 'medium' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_medium_ci
        FROM t
    """,
    doc="Spark 4 string collations: a UTF8_LCASE-collated column makes "
    "DISTINCT and equality case-insensitive engine-side — the "
    "lowercase literal 'medium' matches the stored 'MEDIUM' rows "
    "with no lower() rewrite in user code. DuckDB mirrors with an "
    "explicit lower() projection; distinct counts under the "
    "collation equal distinct counts of the lowercased values.",
)
