"""Scalar function battery (SURVEY.md §2.8): strings, dates, math, arrays,
JSON, net/flow helpers, hashing. One query per family, each a thin
projection so the function mapping itself is what's under test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import flownet
from ..functions.vectors import EMBEDDING_VALID_SQL
from ..sources.tables import load_table
from .helpers import INT_GATE_RE
from .registry import register

#: DuckDB spelling of the embedding validity contract (kept in one
#: place: functions.vectors) — f4's oracle filters through it so both
#: engines exclude the same degenerate vectors.
_EMB_WHERE = EMBEDDING_VALID_SQL.format(col="embedding")

#: ASCII-only case folding for content fingerprints (f8): full Unicode
#: lower() is RUNTIME-DEFINED for a handful of code points (Turkish İ,
#: German ß, Greek final sigma — Java and DuckDB/utf8proc genuinely
#: disagree, found by the r7 hostile-corpus differential), so a stored
#: fingerprint built on it would re-key documents whenever the engine's
#: Unicode tables change. translate() over [A-Z] is bit-stable forever.
_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


@register(
    "f1_strings",
    oracle="""
    SELECT p_partkey,
           -- ß normalization: Java/Spark upper() follows Unicode
           -- SpecialCasing (ß → SS, the default full uppercase) while
           -- DuckDB/utf8proc applies the 1:1 map (ß → ẞ, U+1E9E) — the
           -- one code point in the fixture where the engines' upper()
           -- legitimately differ (r7 hostile-corpus find; same
           -- runtime-defined-casing family as f8's lower())
           replace(upper(p_name), 'ẞ', 'SS') AS uname,
           substr(p_name, 1, 5) AS pfx,
           CAST(length(p_name) AS BIGINT) AS name_len,
           replace(p_name, ' ', '_') AS snake,
           concat(p_brand, ':', p_type) AS brand_type,
           CAST(strpos(p_name, 'bolt') AS BIGINT) AS bolt_pos,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS devowel,
           trim(concat(' ', p_brand, ' ')) AS trimmed
    FROM part
    """,
    description="string function battery (F1)",
    tags=("F1",),
)
def f1_strings(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.substring("p_name", 1, 5).alias("pfx"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.instr("p_name", "bolt").cast("long").alias("bolt_pos"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("devowel"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
    )


@register(
    "f2_dates",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           CAST(day(o_orderdate) AS BIGINT) AS d,
           CAST(isodow(o_orderdate) AS BIGINT) AS dow,
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
               AS days_since,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS eom,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS od
    FROM orders WHERE o_orderkey < 500
    """,
    description="date/time function battery (F2). dow = ISO weekday "
    "(Spark weekday()+1 == DuckDB isodow)",
    tags=("F2",),
)
def f2_dates(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.last_day("o_orderdate").cast("string").alias("eom"),
        F.col("o_orderdate").cast("date").cast("string").alias("od"),
    )


@register(
    "f2b_timestamp_parse",
    oracle="""
    SELECT o_orderkey,
           CAST(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS parsed,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           make_timestamp(CAST(year(o_orderdate) AS BIGINT),
                          CAST(month(o_orderdate) AS BIGINT), 1, 0, 0, 0) AS month_ts
    FROM orders WHERE o_orderkey < 400
    """,
    description="string↔timestamp round trips: format, parse, epoch, "
    "make_timestamp (F2)",
    tags=("F2",),
)
def f2b_timestamp_parse(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    return o.select(
        "o_orderkey",
        F.to_timestamp(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")).alias("parsed"),
        F.unix_timestamp("o_orderdate").cast("long").alias("epoch_s"),
        F.make_timestamp(
            F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1),
            F.lit(0), F.lit(0), F.lit(0),
        ).alias("month_ts"),
    )


@register(
    "f3_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           sqrt(l_extendedprice) AS sqrt_price,
           CAST(ROUND(ln(l_extendedprice), 6) AS DOUBLE) AS ln_price,
           CAST(ROUND(exp(l_discount), 6) AS DOUBLE) AS exp_disc,
           CAST(ROUND(pow(l_quantity, 2), 4) AS DOUBLE) AS qty_sq,
           abs(l_quantity - 25.0) AS qty_dev,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(sign(l_quantity - 25.0) AS DOUBLE) AS qty_sign,
           CAST(l_orderkey % 7 AS BIGINT) AS m7,
           greatest(l_quantity, 10.0) AS qmax,
           least(l_quantity, 10.0) AS qmin
    FROM lineitem WHERE l_orderkey < 300
    """,
    description="math function battery (F3; transcendentals rounded — "
    "libm last-ulp variance)",
    tags=("F3",),
)
def f3_math(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt("l_extendedprice").alias("sqrt_price"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.signum(F.col("l_quantity") - 25.0).alias("qty_sign"),
        (F.col("l_orderkey") % 7).cast("long").alias("m7"),
        F.greatest(F.col("l_quantity"), F.lit(10.0)).alias("qmax"),
        F.least(F.col("l_quantity"), F.lit(10.0)).alias("qmin"),
    )


@register(
    "f4_arrays",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS head,
           CAST(list_max(embedding) AS DOUBLE) AS vmax,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           CAST(ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 4)
                AS DOUBLE) AS vsum,
           array_to_string(list_transform(CAST(embedding[1:3] AS DOUBLE[]),
                          x -> CAST(CAST(ROUND(x * 2, 5) AS DECIMAL(28,5))
                                    AS VARCHAR)), ',') AS head2x
    FROM embeddings WHERE {_EMB_WHERE}
    """,
    description="array + higher-order function battery (F4): size, index, "
    "max, filter, fold, transform+slice. head2x serialized via "
    "decimal(28,5)→string so both engines render doubles identically and "
    "the driver's array-hostile canonicalizer sees a plain string column",
    tags=("F4",),
)
def f4_arrays(spark, sf_dir):
    from ..functions.vectors import embedding_is_valid

    # the battery's exact-decimal serialization (head2x) and the oracle's
    # NaN-hostile list folds require the embedding validity contract —
    # see functions.vectors.embedding_is_valid
    e = load_table(spark, sf_dir, "embeddings").filter(
        embedding_is_valid("embedding"))
    dbl = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        # try_: an empty array is a legal cell; ANSI element_at raises
        # INVALID_ARRAY_INDEX where the oracle's list[1] is NULL
        F.try_element_at("embedding", F.lit(1)).cast("double").alias("head"),
        F.array_max("embedding").cast("double").alias("vmax"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x), 4).alias("vsum"),
        F.array_join(
            F.transform(F.slice(dbl, 1, 3),
                        lambda x: F.round(x * 2, 5).cast("decimal(28,5)")
                        .cast("string")), ",").alias("head2x"),
    )


@register(
    "f4b_explode_wordcount",
    oracle="""
    SELECT tok, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) u
    WHERE tok <> ''
    GROUP BY tok
    """,
    description="explode / one-to-many array expansion (F4): token "
    "wordcount over documents — generator runs inside codegen, partial "
    "aggregation shrinks the shuffle to one row per distinct token",
    tags=("F4",),
)
def f4b_explode_wordcount(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "f6_json",
    oracle=f"""
    WITH j AS (
      -- json_valid guard + TRY_CAST: DuckDB's json_extract_string THROWS
      -- on malformed JSON and CAST('v' AS BIGINT) throws on non-numeric
      -- strings, where Spark's get_json_object/try_cast degrade to NULL
      -- (r7 hostile-corpus find) — the oracle must degrade identically
      SELECT event_id,
             CASE WHEN json_valid(props)
                  THEN json_extract_string(props, '$.k') END AS k_str
      FROM events WHERE event_type = 'click'
    )
    SELECT event_id, k_str,
           -- helpers.INT_GATE_RE on BOTH engines (also applied via
           -- rlike on the Spark side): DuckDB TRY_CAST ROUNDS decimal
           -- strings ('1.5' -> 2) where Spark's try_cast yields NULL,
           -- and the two trim DIFFERENT whitespace — inside the gate
           -- both casts agree, outside it both degrade to NULL
           -- (r8: wrong-typed {{"k": 1.5}} fixture rows caught this)
           TRY_CAST(CASE WHEN regexp_matches(k_str,
                    '{INT_GATE_RE}') THEN k_str END
                    AS BIGINT) AS k,
           TRY_CAST(CASE WHEN regexp_matches(k_str,
                    '{INT_GATE_RE}') THEN k_str END
                    AS BIGINT) % 10 AS k_mod
    FROM j
    """,
    description="JSON extraction over the event props column (F6); "
    "malformed/mistyped props degrade to NULL on both engines",
    tags=("F6",),
)
def f6_json(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    k_str = F.get_json_object("props", "$.k")
    # the SAME gate the oracle applies (helpers.INT_GATE_RE), then
    # try_cast: a non-numeric "k" value is legal JSON; a plain cast
    # aborts under ANSI (CAST_INVALID_INPUT) where the oracle degrades
    # to NULL, and an UNGATED try_cast trims control chars the oracle's
    # regex rejects (r8 review)
    k = F.when(k_str.rlike(INT_GATE_RE), k_str).try_cast("long")
    return ev.select(
        "event_id",
        k_str.alias("k_str"),
        k.alias("k"),
        (k % 10).alias("k_mod"),
    )


# --- synthesized flow source address (shared by f7 and j15) -----------------
# octet formula (id%223+10).(id//7 %256).(id//11 %256).(id%256): ONE
# definition each for the dotted-string and 32-bit-integer forms, on both
# the Spark and oracle sides — f7's rollups and j15's ASN enrichment
# describe "the same flows", and a modulus edited in one copy would
# silently break that claim without failing either per-query oracle.

_SA_STR_SQL = """concat(CAST(event_id % 223 + 10 AS VARCHAR), '.',
                    CAST((event_id // 7) % 256 AS VARCHAR), '.',
                    CAST((event_id // 11) % 256 AS VARCHAR), '.',
                    CAST(event_id % 256 AS VARCHAR))"""

_SA_INT_SQL = """
    CAST(event_id % 223 + 10 AS BIGINT) * 16777216 +
    CAST((event_id // 7) % 256 AS BIGINT) * 65536 +
    CAST((event_id // 11) % 256 AS BIGINT) * 256 +
    CAST(event_id % 256 AS BIGINT)
"""


def _sa_ip_str():
    eid = F.col("event_id")
    return F.concat_ws(
        ".",
        (eid % 223 + 10).cast("string"),
        (F.expr("event_id div 7") % 256).cast("string"),
        (F.expr("event_id div 11") % 256).cast("string"),
        (eid % 256).cast("string"),
    )


def _sa_ip_int():
    eid = F.col("event_id")
    return ((eid % 223 + 10).cast("bigint") * 16777216
            + (F.expr("event_id div 7") % 256).cast("bigint") * 65536
            + (F.expr("event_id div 11") % 256).cast("bigint") * 256
            + (eid % 256).cast("bigint"))


@register(
    "f7_flownet",
    oracle=f"""
    WITH t AS (
      SELECT event_id,
             {_SA_STR_SQL} AS src_ip,
             CAST(event_id % 64 AS INT) AS flags,
             CAST(event_id % 1024 AS INT) AS dport
      FROM events
    ), p AS (
      SELECT event_id, src_ip, flags, dport,
             CAST(split_part(src_ip, '.', 1) AS BIGINT) * 16777216 +
             CAST(split_part(src_ip, '.', 2) AS BIGINT) * 65536 +
             CAST(split_part(src_ip, '.', 3) AS BIGINT) * 256 +
             CAST(split_part(src_ip, '.', 4) AS BIGINT) AS ip_int
      FROM t
    )
    SELECT split_part(src_ip, '.', 1) || '.' || split_part(src_ip, '.', 2) AS net16,
           COUNT(*) AS n_flows,
           CAST(SUM(ip_int) AS BIGINT) AS sum_ip,
           COUNT(*) FILTER (WHERE ip_int >= 167772160 AND ip_int < 184549376)
               AS n_in_10slash8,
           COUNT(*) FILTER (WHERE (flags & 2) > 0 AND (flags & 16) > 0) AS n_syn_ack,
           COUNT(*) FILTER (WHERE dport IN (80, 443, 8080, 8443)) AS n_web
    FROM p GROUP BY 1
    """,
    description="net/flow helper battery (F7): IPv4↔int, CIDR membership, "
    "TCP-flag bits, service classes — the reference's flow-report vocabulary "
    "exercised on synthesized addresses",
    tags=("F7",),
)
def f7_flownet(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    t = ev.select(
        "event_id",
        _sa_ip_str().alias("src_ip"),
        (eid % 64).cast("int").alias("flags"),
        (eid % 1024).cast("int").alias("dport"),
    )
    ip_int = flownet.ipv4_to_long(F.col("src_ip"))
    parts = F.split("src_ip", r"\.")
    return (
        t.withColumn("ip_int", ip_int)
        .groupBy(
            F.concat_ws(".", F.try_element_at(parts, F.lit(1)),
                        F.try_element_at(parts, F.lit(2))).alias("net16")
        )
        .agg(
            F.count(F.lit(1)).alias("n_flows"),
            F.sum("ip_int").alias("sum_ip"),
            F.count_if(flownet.in_cidr(F.col("src_ip"), "10.0.0.0/8")).alias("n_in_10slash8"),
            F.count_if(
                (F.col("flags").bitwiseAND(2) > 0) & (F.col("flags").bitwiseAND(16) > 0)
            ).alias("n_syn_ack"),
            F.count_if(flownet.service_class(F.col("dport")) == "web").alias("n_web"),
        )
    )


@register(
    "f7b_flownet6",
    oracle="""
    WITH t AS (
      SELECT event_id,
             '2001:db8:' || to_hex(event_id % 256) ||
             CASE WHEN event_id % 2 = 0
                  THEN '::' || to_hex(event_id % 65536)
                  ELSE ':1::' || to_hex(event_id % 4096) || ':5' END AS src6
      FROM events
    ), s AS (
      SELECT event_id, src6, string_split(src6, '::') AS p2 FROM t
    ), g AS (
      SELECT event_id, src6,
             list_filter(string_split(p2[1], ':'), x -> x <> '') AS lg,
             CASE WHEN len(p2) > 1
                  THEN list_filter(string_split(p2[2], ':'), x -> x <> '')
                  ELSE [] END AS rg
      FROM s
    ), n AS (
      SELECT event_id,
             array_to_string(list_transform(
               list_concat(list_concat(
                 lg, list_transform(range(8 - len(lg) - len(rg)), y -> '0')), rg),
               y -> lpad(lower(y), 4, '0')), '') AS norm
      FROM g
    )
    SELECT substr(norm, 1, 12) AS net48,
           COUNT(*) AS n_flows,
           MIN(norm) AS sample_norm,
           COUNT(*) FILTER (WHERE substr(norm, 1, 11) = '20010db8000') AS n_in_44
    FROM n GROUP BY 1
    """,
    description="IPv6 flow helpers (F7): '::'-expanding canonical "
    "normalization, nibble-aligned /48 prefix grouping, /44 CIDR membership "
    "— all built-in array/string expressions, no UDFs (functions.flownet; "
    "non-nibble-aligned masks unit-tested vs stdlib ipaddress)",
    tags=("F7",),
)
def f7b_flownet6(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    src6 = F.concat(
        F.lit("2001:db8:"),
        F.lower(F.hex(eid % 256)),
        F.when(eid % 2 == 0, F.concat(F.lit("::"), F.lower(F.hex(eid % 65536))))
        .otherwise(F.concat(F.lit(":1::"), F.lower(F.hex(eid % 4096)), F.lit(":5"))),
    )
    t = ev.select("event_id", src6.alias("src6"))
    return (
        t.groupBy(flownet.ipv6_prefix(F.col("src6"), 48).alias("net48"))
        .agg(
            F.count(F.lit(1)).alias("n_flows"),
            F.min(flownet.ipv6_normalize(F.col("src6"))).alias("sample_norm"),
            F.count_if(flownet.in_cidr6(F.col("src6"), "2001:db8::/44")).alias("n_in_44"),
        )
    )


@register(
    "f8_hash",
    oracle=f"""
    SELECT doc_id,
           md5(text) AS text_md5,
           md5(translate(text, '{_ASCII_UPPER}', '{_ASCII_LOWER}'))
               AS norm_md5,
           sha256(source) AS src_sha
    FROM documents
    """,
    description="deterministic hash functions (F8): md5 / sha256. The "
    "case-normalized fingerprint folds ONLY [A-Z] (translate, both "
    "engines): full Unicode lower() is runtime-defined for İ/ß/final-"
    "sigma (Java vs utf8proc diverge — hostile-corpus differential find, "
    "r7), and a fingerprint that changes when the JVM's Unicode tables "
    "upgrade would silently re-key every stored document.",
    tags=("F8",),
)
def f8_hash(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.md5(F.translate("text", _ASCII_UPPER, _ASCII_LOWER))
            .alias("norm_md5"),
        F.sha2("source", 256).alias("src_sha"),
    )


@register(
    "f4d_array_predicates",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, source, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           len(list_filter(toks, x -> length(x) >= 8)) > 0 AS has_long,
           len(list_filter(toks, x -> NOT (length(x) < 10))) = 0 AS all_short,
           CAST(COALESCE(list_position(toks, 'the'), 0) AS BIGINT) AS pos_the,
           array_to_string(list_slice(toks, 1, 3), '-') AS first3,
           array_to_string(list_transform(range(2), i -> lang), ',') AS rep,
           CAST(len(list_filter([nullif(lang, 'en'), source],
                                x -> x IS NOT NULL)) AS BIGINT) AS n_nonnull
    FROM t
    """,
    description="array predicate/indexing battery (F4): exists / forall "
    "(higher-order predicates), array_position (1-based, 0 when absent — "
    "DuckDB NULL coalesced), slice (Spark length vs DuckDB end-inclusive "
    "mapped), array_repeat, array_compact over a nullable constructed "
    "array. Scale: all per-row codegen lambdas, no shuffle.",
    tags=("F4",),
)
def f4d_array_predicates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.exists(toks, lambda x: F.length(x) >= 8).alias("has_long"),
        F.forall(toks, lambda x: F.length(x) < 10).alias("all_short"),
        F.array_position(toks, "the").cast("bigint").alias("pos_the"),
        F.array_join(F.slice(toks, 1, 3), "-").alias("first3"),
        F.array_join(F.array_repeat(F.col("lang"), 2), ",").alias("rep"),
        F.size(F.array_compact(F.array(F.nullif("lang", F.lit("en")),
                                       F.col("source"))))
        .cast("bigint").alias("n_nonnull"),
    )


@register(
    "f14_struct_ops",
    oracle="""
    SELECT o_custkey,
           o_totalprice AS best_price,
           o_orderkey AS best_key
    FROM (
      SELECT o_custkey, o_totalprice, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey DESC)
               AS rn
      FROM orders WHERE o_custkey < 300
    ) WHERE rn = 1
    """,
    description="struct surface (F-struct): per-customer argmax via "
    "max(struct(price, key)) — Spark orders structs lexicographically, so "
    "one hash aggregate replaces the window-rank plan the oracle uses "
    "(DuckDB max(struct) ranks NULLs differently, hence the rn form). "
    "Field access via s.field after the agg. Scale: map-side partial max "
    "per key — no window sort, no row shuffle beyond the keyed agg.",
    tags=("A10", "F-struct"),
)
def f14_struct_ops(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    best = o.groupBy("o_custkey").agg(
        F.max(F.struct("o_totalprice", "o_orderkey")).alias("s")
    )
    return best.select(
        "o_custkey",
        F.col("s.o_totalprice").alias("best_price"),
        F.col("s.o_orderkey").alias("best_key"),
    )


@register(
    "f15_url_parsing",
    oracle="""
    WITH u AS (
      SELECT 'cdn' || (doc_id % 5) || '.example.org' AS host,
             '/' || lang || '/doc' || doc_id AS path,
             CAST(n_chars AS VARCHAR) AS qn,
             n_chars
      FROM documents
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(path) AS first_path,
           CAST(SUM(CAST(qn AS BIGINT)) AS BIGINT) AS sum_query_n
    FROM u GROUP BY host
    """,
    description="URL parsing surface (F-url): deterministic URLs built "
    "from document fields, then parse_url(HOST/PATH/QUERY-key) extracts "
    "the components back — the oracle recomputes the components from the "
    "same construction, so the parser itself is under the hash gate. "
    "Scale: JVM codegen expression, no shuffle before the host rollup "
    "(the host-cardinality grouping is the classic web-corpus "
    "provenance breakdown).",
    tags=("F1", "F15"),
)
def f15_url_parsing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://cdn"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".example.org/"), F.col("lang"),
        F.lit("/doc"), F.col("doc_id").cast("string"),
        F.lit("?src="), F.col("source"),
        F.lit("&n="), F.col("n_chars").cast("string"),
    )
    parsed = docs.select(
        "n_chars",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("n")).alias("qn"),
    )
    return parsed.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("path").alias("first_path"),
        F.sum(F.col("qn").cast("bigint")).alias("sum_query_n"),
    )


# -- longest-prefix-match enrichment ----------------------------------------
#
# The routing-table lookup every flow pipeline needs (ip -> ASN/geo): match
# each address against a CIDR prefix table and keep the longest matching
# prefix. A theta join (ip BETWEEN net_start AND net_end) degenerates to a
# broadcast nested loop; the scalable shape used here is the classic
# prefix-length expansion: explode each ip once per DISTINCT prefix length
# (|lens| <= 33, here 7), equi-join on (len, ip >> (32-len)) against the
# masked prefix table, then keep the longest match per ip. With the prefix
# table broadcast this is shuffle-free regardless of table size — a real
# 1M-entry BGP table works the same way.
_LPM_PREFIXES = [
    # (asn, dotted net, prefix len) — nets are alignment-checked below
    (64500, "10.0.0.0", 8),
    (64501, "10.128.0.0", 9),
    (64502, "10.128.64.0", 18),
    (64510, "20.0.0.0", 8),
    (64511, "20.96.0.0", 11),
    (64520, "64.0.0.0", 2),
    (64530, "128.0.0.0", 1),
    (64540, "100.64.0.0", 10),
    (0, "0.0.0.0", 0),
]


def _ip4_to_int(dotted: str) -> int:
    o = [int(x) for x in dotted.split(".")]
    return (o[0] << 24) + (o[1] << 16) + (o[2] << 8) + o[3]


_LPM_ROWS = [(asn, _ip4_to_int(net), ln) for asn, net, ln in _LPM_PREFIXES]
for _asn, _net, _ln in _LPM_ROWS:
    assert _net >> (32 - _ln) << (32 - _ln) == _net if _ln else _net == 0, \
        f"misaligned prefix {_asn}"
_LPM_LENS = sorted({ln for _, _, ln in _LPM_ROWS})

_LPM_VALUES = ", ".join(f"({asn}, {net}::BIGINT, {ln})"
                        for asn, net, ln in _LPM_ROWS)

@register(
    "j15_lpm_enrich",
    oracle=f"""
    WITH ips AS (
      SELECT event_id, {_SA_INT_SQL} AS ip,
             CAST(event_id % 5000 + 40 AS BIGINT) AS ibyt
      FROM events
    ), best AS (
      SELECT i.event_id, i.ip, i.ibyt, p.asn
      FROM ips i JOIN (VALUES {_LPM_VALUES}) p(asn, net, len)
        ON (i.ip >> (32 - p.len)) = (p.net >> (32 - p.len))
      QUALIFY row_number() OVER (PARTITION BY i.event_id
                                 ORDER BY p.len DESC) = 1
    )
    SELECT asn,
           CAST(COUNT(*) AS BIGINT) AS n_flows,
           CAST(COUNT(DISTINCT ip) AS BIGINT) AS n_ips,
           CAST(SUM(ibyt) AS BIGINT) AS total_bytes
    FROM best GROUP BY asn
    """,
    description="longest-prefix-match ASN enrichment (J-custom, F7): "
    "synthesized flow source addresses matched against a CIDR prefix "
    "table, longest prefix wins, per-ASN traffic rollup. Scale: "
    "prefix-length expansion turns LPM into an equi-join — each ip "
    "explodes once per distinct prefix length (7 here, <=33 ever) and "
    "joins on (len, masked ip) against the BROADCAST masked prefix "
    "table; no nested loop, no shuffle of the fact side beyond the "
    "final small per-ASN aggregation.",
    tags=("J1", "J5", "F7", "A1"),
)
def j15_lpm_enrich(spark, sf_dir):
    eid = F.col("event_id")
    ips = load_table(spark, sf_dir, "events").select(
        "event_id",
        _sa_ip_int().alias("ip"),
        (eid % 5000 + 40).cast("bigint").alias("ibyt"),
    )
    prefixes = spark.createDataFrame(
        [(asn, net >> (32 - ln) if ln else 0, ln) for asn, net, ln in _LPM_ROWS],
        "asn INT, masked BIGINT, len INT")
    cand = (
        ips.select("*", F.explode(F.array(
            *[F.lit(ln) for ln in _LPM_LENS])).alias("len"))
        .withColumn("masked", F.expr(
            "CASE WHEN len = 0 THEN CAST(0 AS BIGINT)"
            " ELSE shiftright(ip, 32 - len) END"))
        .join(F.broadcast(prefixes), ["len", "masked"])
    )
    # longest match via max_by hash-agg (map-side partials), not a
    # row_number window — a sort-window on the exploded fact has no
    # partial aggregation and shuffles 7x the rows
    best = (cand.groupBy("event_id", "ip", "ibyt")
            .agg(F.max_by("asn", "len").alias("asn")))
    return best.groupBy("asn").agg(
        F.count(F.lit(1)).alias("n_flows"),
        F.countDistinct("ip").alias("n_ips"),
        F.sum("ibyt").alias("total_bytes"),
    )


# -- biflow stitching --------------------------------------------------------
#
# RFC 5103-style bidirectional flow aggregation: unidirectional flow records
# for the same conversation (client->server and server->client) collapse
# into one biflow row with per-direction counters. Flows are synthesized
# deterministically from events: each event joins one of 50 conversations
# between a low-host (0..22) and a high-host (30..46), odd event_ids being
# the reverse direction. The canonical conversation key is
# (least(sa,da), greatest(sa,da), service port), so both directions land in
# the same group and the per-direction split is a conditional aggregate —
# one shuffle, map-side partials, no self-join.
@register(
    "f7c_biflow_stitch",
    oracle="""
    WITH flows AS (
      SELECT event_id % 50 AS conv,
             CASE WHEN event_id % 2 = 0 THEN (event_id % 50) % 23
                  ELSE (event_id % 50) % 17 + 30 END AS sa,
             CASE WHEN event_id % 2 = 0 THEN (event_id % 50) % 17 + 30
                  ELSE (event_id % 50) % 23 END AS da,
             CAST(event_id % 1500 + 40 AS BIGINT) AS ibyt,
             CAST(event_id % 30 + 1 AS BIGINT) AS ipkt
      FROM events
    )
    SELECT least(sa, da) AS client_host,
           greatest(sa, da) AS server_host,
           CAST(443 AS INT) AS svc_port,
           CAST(COUNT(*) FILTER (WHERE sa < da) AS BIGINT) AS n_fwd,
           CAST(COUNT(*) FILTER (WHERE sa > da) AS BIGINT) AS n_rev,
           CAST(COALESCE(SUM(ibyt) FILTER (WHERE sa < da), 0) AS BIGINT)
               AS fwd_bytes,
           CAST(COALESCE(SUM(ibyt) FILTER (WHERE sa > da), 0) AS BIGINT)
               AS rev_bytes,
           CAST(SUM(ipkt) AS BIGINT) AS total_pkts
    FROM flows GROUP BY 1, 2, 3
    """,
    description="biflow stitching (RFC 5103 / nfdump -B analogue): "
    "unidirectional flows collapse into per-conversation biflows keyed on "
    "the canonical (least,greatest) host pair, per-direction packet/byte "
    "counters via conditional aggregates. Scale: single hash-agg shuffle "
    "on the conversation key with map-side partials — no self-join, no "
    "window; the classic 2x-row reduction before any downstream report.",
    tags=("F7", "A1", "A9"),
)
def f7c_biflow_stitch(spark, sf_dir):
    eid = F.col("event_id")
    conv = eid % 50
    lo_host = conv % 23
    hi_host = conv % 17 + 30
    fwd = eid % 2 == 0
    flows = load_table(spark, sf_dir, "events").select(
        F.when(fwd, lo_host).otherwise(hi_host).alias("sa"),
        F.when(fwd, hi_host).otherwise(lo_host).alias("da"),
        (eid % 1500 + 40).cast("bigint").alias("ibyt"),
        (eid % 30 + 1).cast("bigint").alias("ipkt"),
    )
    is_fwd = F.col("sa") < F.col("da")
    return (
        flows.groupBy(
            F.least("sa", "da").alias("client_host"),
            F.greatest("sa", "da").alias("server_host"),
            F.lit(443).alias("svc_port"))
        .agg(
            F.count(F.when(is_fwd, 1)).alias("n_fwd"),
            F.count(F.when(~is_fwd, 1)).alias("n_rev"),
            F.coalesce(F.sum(F.when(is_fwd, F.col("ibyt"))), F.lit(0))
             .alias("fwd_bytes"),
            F.coalesce(F.sum(F.when(~is_fwd, F.col("ibyt"))), F.lit(0))
             .alias("rev_bytes"),
            F.sum("ipkt").alias("total_pkts"),
        )
    )
