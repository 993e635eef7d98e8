"""Hive-compat function pack — the §2.6 gap set: functions the
reference registers (QL/exec/FunctionRegistry.java) that Spark lacks
as builtins, re-expressed as thin expression helpers (JVM-side
column expressions — NOT Python UDFs) plus one DataFrame-level op
for the n-gram UDAFs.

Gap inventory (SURVEY.md §2.6/§7.2):
- ngrams / context_ngrams (FunctionRegistry.java:342-370,
  GenericUDAFnGrams) → top_ngrams() DataFrame op (explode+count —
  at scale this is the only shape that works anyway; the reference's
  in-memory EstimatedFrequency heap caps per-group memory, here the
  aggregation is distributed).
- field(v, a, b, ...) (FunctionRegistry `field`) → field() when-chain.
- parse_url_tuple (GenericUDTFParseUrlTuple) → parse_url_tuple()
  multi-column select helper over Spark's parse_url.
- create_union / UNIONTYPE (SERDE UnionTypeInfo; SURVEY §7.3 #2) →
  tagged-struct encoding: create_union() / union_tag() / union_field().
- in_file(str, filename) (GenericUDFInFile) → in_file() helper:
  driver reads the file once, broadcasts as a literal array.
- reflect/java_method — NOT part of this pack: Spark ships static
  JVM reflection natively (CallMethodViaReflection; re-audited r11,
  pinned in tests/test_function_audit.py). Only reflect2 (instance
  methods on the value's boxed class) stays dropped (README).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import register


def field(value: Column, *options: Column | str) -> Column:
    """Hive ``field(v, a, b, ...)``: 1-based index of v in the
    argument list, 0 if absent (FunctionRegistry `field`)."""
    result = F.lit(0)
    for i in reversed(range(len(options))):
        opt = options[i] if isinstance(options[i], Column) else F.lit(options[i])
        result = F.when(value == opt, F.lit(i + 1)).otherwise(result)
    return result


_URL_PARTS = ("HOST", "PATH", "QUERY", "REF", "PROTOCOL", "AUTHORITY", "FILE", "USERINFO")


def parse_url_tuple(url: Column, *parts: str) -> list[Column]:
    """parse_url_tuple(url, p1, p2, ...) → one column per part
    (reference: GenericUDTFParseUrlTuple — a UDTF emitting one row;
    column-wise is the Spark-idiomatic equivalent). ``QUERY:key``
    extracts a single query parameter."""
    cols = []
    for p in parts:
        if p.startswith("QUERY:"):
            cols.append(F.parse_url(url, F.lit("QUERY"), F.lit(p[6:])).alias(p.replace(":", "_")))
        else:
            if p not in _URL_PARTS:
                raise ValueError(f"unknown url part: {p}")
            cols.append(F.parse_url(url, F.lit(p)).alias(p.lower()))
    return cols


def create_union(tag: Column, *fields: Column) -> Column:
    """UNIONTYPE encoding (SURVEY §7.3 #2): Spark has no union type,
    so unions are structs ``{tag: tinyint, field0.., fieldN}`` with
    exactly one active field per row (the others NULL)."""
    members = [F.lit(None).cast("string") if f is None else f for f in fields]
    struct_fields = [tag.cast("tinyint").alias("tag")]
    for i, f in enumerate(members):
        struct_fields.append(F.when(tag == i, f).alias(f"field{i}"))
    return F.struct(*struct_fields)


def union_tag(u: Column) -> Column:
    return u.getField("tag")


def union_field(u: Column, i: int) -> Column:
    return u.getField(f"field{i}")


def in_file(col: Column, path: str) -> Column:
    """GenericUDFInFile: true iff the column value appears as a line
    in the given (driver-local) file. The line set is embedded as a
    literal array — the broadcast-small-set idiom."""
    with open(path) as fh:
        lines = [ln.rstrip("\n") for ln in fh]
    return col.isin(*lines) if lines else F.lit(False)


def top_ngrams(
    df: DataFrame, text_col: str, n: int, k: int, precision: int = 0
) -> DataFrame:
    """Hive ``ngrams(sentences(text), n, k)`` equivalent: top-k word
    n-grams by frequency. precision is accepted for signature parity
    (the reference uses it to size its frequency-estimation heap;
    the distributed aggregation here is exact)."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    # short-doc guard: for size < n, sequence(0, size-n) auto-steps
    # DOWNWARD and slice(..., 0, ...) raises at runtime (the same
    # hazard llm/dedup._shingles pins); such docs contribute no grams,
    # matching the oracles' empty range().
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("estfrequency"))
        .orderBy(F.desc("estfrequency"), "ngram")
        .limit(k)
    )


def context_ngrams(
    df: DataFrame, text_col: str, context: list[str | None], k: int
) -> DataFrame:
    """Hive ``context_ngrams``: like ngrams but with a context
    template — NULL slots are wildcards to fill, non-NULL words must
    match. E.g. ["spark", None] → top words following "spark"."""
    n = len(context)
    toks = F.split(F.lower(F.col(text_col)), " ")
    # same short-doc guard as top_ngrams
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.slice(toks, i + 1, n),
        ),
    ).otherwise(F.expr("array()").cast("array<array<string>>"))
    cond = F.lit(True)
    for pos, word in enumerate(context):
        if word is not None:
            cond = cond & (F.element_at(F.col("gram"), pos + 1) == word.lower())
    wildcard_positions = [i for i, w in enumerate(context) if w is None]
    out_expr = F.concat_ws(
        " ", *[F.element_at(F.col("gram"), p + 1) for p in wildcard_positions]
    )
    return (
        df.select(F.explode(grams).alias("gram"))
        .filter(cond)
        .select(out_expr.alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("estfrequency"))
        .orderBy(F.desc("estfrequency"), "ngram")
        .limit(k)
    )


@register(
    "ngrams_top_bigrams",
    tags=("function", "udaf", "llm", "text"),
    oracle="""
SELECT ngram, estfrequency FROM (
  SELECT array_to_string(parts[i:i+1], ' ') AS ngram, COUNT(*) AS estfrequency
  FROM (SELECT string_split(lower(text), ' ') AS parts FROM documents) d,
       unnest(range(1, len(parts))) AS t(i)
  GROUP BY 1
)
ORDER BY estfrequency DESC, ngram
LIMIT 15
""",
)
def ngrams_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference ngrams() UDAF surface: top-15 word bigrams over the
    corpus (GenericUDAFnGrams)."""
    t = tables(spark, sf_dir)
    return top_ngrams(t.documents, "text", n=2, k=15)


@register(
    "context_ngrams_after_spark",
    tags=("function", "udaf", "llm", "text"),
    oracle="""
SELECT ngram, estfrequency FROM (
  SELECT parts[i+1] AS ngram, COUNT(*) AS estfrequency
  FROM (SELECT string_split(lower(text), ' ') AS parts FROM documents) d,
       unnest(range(1, len(parts))) AS t(i)
  WHERE parts[i] = 'spark'
  GROUP BY 1
)
ORDER BY estfrequency DESC, ngram
LIMIT 10
""",
)
def context_ngrams_after_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """context_ngrams(['spark', NULL], 10): top words following
    'spark' (GenericUDAFContextNGrams)."""
    t = tables(spark, sf_dir)
    return context_ngrams(t.documents, "text", ["spark", None], k=10)


@register(
    "field_function_priority",
    tags=("function",),
    oracle="""
SELECT o_orderpriority,
       CASE o_orderpriority
         WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 WHEN '3-MEDIUM' THEN 3
         WHEN '4-NOT SPECIFIED' THEN 4 WHEN '5-LOW' THEN 5 ELSE 0
       END AS priority_rank,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY priority_rank
""",
)
def field_function_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """field() compat helper in action: map enum strings to ranks."""
    t = tables(spark, sf_dir)
    rank = field(
        F.col("o_orderpriority"),
        "1-URGENT",
        "2-HIGH",
        "3-MEDIUM",
        "4-NOT SPECIFIED",
        "5-LOW",
    )
    return (
        t.orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("o_orderpriority", rank.alias("priority_rank"), "n")
        .orderBy("priority_rank")
    )
