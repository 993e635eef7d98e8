"""Lateral views / table-generating functions (UDTFs) and
complex-type constructors.

Reference parity (SURVEY.md §2.1, §2.6): LateralViewForward/
LateralViewJoinOperator (QL/exec/LateralViewForwardOperator.java:31,
LateralViewJoinOperator.java:75) duplicate rows through a UDTF and
rejoin; UDTFOperator (QL/exec/UDTFOperator.java:42) runs explode,
posexplode, inline, stack, json_tuple, parse_url_tuple
(FunctionRegistry.java:412-417). Complex-type functions: array, map,
struct, named_struct, sort_array, array_contains, map_keys,
map_values, str_to_map (:378-399).

Spark mapping: generator expressions (F.explode / posexplode /
inline / stack) are evaluated inside a Generate node — no row
duplication machinery needed; LATERAL VIEW syntax parses verbatim in
Spark SQL.

Scale note: explode fan-out multiplies row counts before any
shuffle — always aggregate or filter in the same stage as the
generate (as these queries do) so the expanded rows never hit an
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import register


@register(
    "explode_word_counts",
    tags=("lateral", "udtf", "agg"),
    oracle="""
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) w
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 20
""",
)
def explode_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode(split(...)) — word count over documents
    (reference: GenericUDTFExplode via LateralViewJoinOperator).
    The aggregate runs in the same stage as the generate; only 20
    (word,count) pairs cross the final exchange."""
    t = tables(spark, sf_dir)
    return (
        t.documents.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


@register(
    "posexplode_tokens",
    tags=("lateral", "udtf"),
    oracle="""
SELECT doc_id, s.pos1 - 1 AS pos, parts[s.pos1] AS word
FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM documents
      WHERE doc_id % 100 = 5) t,
     unnest(generate_series(1, len(parts))) AS s(pos1)
""",
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — position-tagged explode (reference:
    GenericUDTFPosExplode). DuckDB lacks WITH ORDINALITY, so the
    oracle reconstructs positions via generate_series indexing."""
    t = tables(spark, sf_dir)
    return (
        t.documents.filter(F.col("doc_id") % 100 == 5)
        .select("doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"))
    )


@register(
    "lateral_view_sql",
    tags=("lateral", "udtf", "sql"),
    oracle="""
SELECT lang, word, COUNT(*) AS n
FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents) w
WHERE word IN ('spark', 'table', 'query')
GROUP BY lang, word
ORDER BY lang, word
""",
)
def lateral_view_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW through the SQL surface — the reference's exact
    grammar (HiveParser.g:256 TOK_LATERAL_VIEW) parses in Spark SQL."""
    tables(spark, sf_dir)
    return spark.sql(
        """
SELECT lang, word, COUNT(*) AS n
FROM documents LATERAL VIEW explode(split(text, ' ')) w AS word
WHERE word IN ('spark', 'table', 'query')
GROUP BY lang, word
ORDER BY lang, word
"""
    )


@register(
    "json_extraction",
    tags=("json", "udtf"),
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / json_tuple over the events.props JSON column
    (reference: GenericUDTFJSONTuple, FunctionRegistry.java:270).
    JSON parsing stays JVM-side (Jackson) — no Python on this path."""
    t = tables(spark, sf_dir)
    return (
        t.events.select(
            "event_type", F.get_json_object("props", "$.k").cast("bigint").alias("k")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "stack_constant_table",
    tags=("udtf",),
    oracle="""
SELECT * FROM (VALUES (1, 'ASIA'), (2, 'EUROPE'), (3, 'AFRICA')) v(rank_id, region_name)
ORDER BY rank_id
""",
)
def stack_constant_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stack(n, ...) constant table generator (reference:
    GenericUDTFStack) ↔ ANSI VALUES."""
    tables(spark, sf_dir)
    return spark.sql(
        """
SELECT * FROM (
  SELECT stack(3, 1, 'ASIA', 2, 'EUROPE', 3, 'AFRICA') AS (rank_id, region_name)
)
ORDER BY rank_id
"""
    )


@register(
    "complex_types_roundtrip",
    tags=("complex-types",),
    oracle="""
SELECT n_nationkey,
       [n_nationkey, n_regionkey] AS key_arr,
       len([n_nationkey, n_regionkey]) AS arr_size,
       list_contains([n_nationkey, n_regionkey], 0) AS has_zero,
       {'nation': n_name, 'region_key': CAST(n_regionkey AS VARCHAR)}['nation'] AS nation_from_map,
       struct_pack(k := n_nationkey, name := n_name).name AS name_from_struct
FROM nation
ORDER BY n_nationkey
""",
)
def complex_types_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array/map/named_struct construction + indexing + size +
    array_contains (reference: FunctionRegistry.java:378-399)."""
    t = tables(spark, sf_dir)
    arr = F.array("n_nationkey", "n_regionkey")
    m = F.create_map(
        F.lit("nation"), F.col("n_name"), F.lit("region_key"), F.col("n_regionkey").cast("string")
    )
    st = F.named_struct(F.lit("k"), F.col("n_nationkey"), F.lit("name"), F.col("n_name"))
    return t.nation.select(
        "n_nationkey",
        arr.alias("key_arr"),
        F.size(arr).alias("arr_size"),
        F.array_contains(arr, F.lit(0)).alias("has_zero"),
        m.getItem("nation").alias("nation_from_map"),
        st.getField("name").alias("name_from_struct"),
    ).orderBy("n_nationkey")


@register(
    "str_to_map_props",
    tags=("complex-types", "string"),
    oracle="""
SELECT r_name, CAST(r_regionkey AS VARCHAR) AS key_val
FROM region
ORDER BY r_name
""",
)
def str_to_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str_to_map (reference: GenericUDFStringToMap,
    FunctionRegistry.java:233-area) — build a map from a delimited
    string and index it."""
    t = tables(spark, sf_dir)
    encoded = F.concat(
        F.lit("name="), F.col("r_name"), F.lit(",key="), F.col("r_regionkey").cast("string")
    )
    return t.region.select(
        "r_name",
        F.str_to_map(encoded, F.lit(","), F.lit("=")).getItem("key").alias("key_val"),
    ).orderBy("r_name")


@register(
    "lateral_view_outer",
    tags=("lateral", "udtf"),
    oracle="""
SELECT d.doc_id, u.tok
FROM documents d
LEFT JOIN LATERAL (
  SELECT unnest(list_filter(string_split(d.text, ' '), t -> t = 'vector')) AS tok
) u ON TRUE
WHERE d.doc_id < 50
ORDER BY d.doc_id, u.tok
""",
)
def lateral_view_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW OUTER (HiveParser.g:256-257 TOK_LATERAL_VIEW_OUTER;
    LateralViewJoinOperator outer mode): rows whose generator yields an
    EMPTY array survive with NULL generator output, instead of being
    dropped like the inner form. The oracle spells the same semantics
    as DuckDB LEFT JOIN LATERAL unnest. Generator runs inline in the
    scan stage — no shuffle."""
    tables(spark, sf_dir)
    return spark.sql(
        """
SELECT doc_id, tok
FROM documents
LATERAL VIEW OUTER explode(filter(split(text, ' '), t -> t = 'vector')) x AS tok
WHERE doc_id < 50
ORDER BY doc_id, tok
"""
    )
