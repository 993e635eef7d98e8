"""Benchmark decontamination + corpus hygiene operators.

Beyond the reference surface: the remaining scoring passes a
training-data pipeline runs between raw ingest and training —
benchmark decontamination (drop train docs sharing n-grams with an
eval set), boilerplate detection (corpus-frequent n-grams), within-
document repetition scoring, and the compound quality filter stage.

Scale design: decontamination joins the corpus against the EVAL
set's n-grams — eval sets are tiny (thousands of docs) so the gram
set broadcasts at any corpus size and the pass is one scan + one
broadcast join + one groupBy keyed on doc_id; boilerplate detection
is one groupBy on the gram hash; repetition/quality scoring are pure
projections (no shuffle). No Python in any row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import register

_DECONTAM_WIDTH = 4  # eval-overlap n-gram width
_BOILER_WIDTH = 5    # boilerplate n-gram width
_EVAL_SOURCE = "src1"  # the fixture source standing in for an eval benchmark


def _word_ngrams(col: str, width: int):
    """Distinct lowercase word n-grams (space-joined); empty array
    for docs shorter than the window (mirrors the DuckDB oracles'
    empty comprehension range). Thin wrapper over the single shingle
    implementation in llm/dedup.py — its short-doc guard was once
    re-derived here by hand, which is exactly the divergence this
    import prevents."""
    from amplab_hive_spark.llm.dedup import _shingles

    return _shingles(col, width, sep=" ")


def _ngram_cte(width: int, where: str = "") -> str:
    """DuckDB shingling CTE body shared by the oracles."""
    return f"""
  SELECT doc_id, source,
         unnest(list_distinct([
           array_to_string(parts[i:i+{width - 1}], ' ')
           FOR i IN range(1, len(parts) - {width - 2})
         ])) AS g
  FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS parts
        FROM documents{where})
"""


@register(
    "pipeline_decontaminate",
    tags=("llm", "pipeline", "decontamination"),
    oracle=f"""
WITH grams AS ({_ngram_cte(_DECONTAM_WIDTH)}),
eval_grams AS (SELECT DISTINCT g FROM grams WHERE source = '{_EVAL_SOURCE}'),
train AS (SELECT doc_id, source, g FROM grams WHERE source <> '{_EVAL_SOURCE}')
SELECT t.doc_id, t.source, COUNT(DISTINCT t.g) AS n_overlapping_grams
FROM train t JOIN eval_grams e ON t.g = e.g
GROUP BY t.doc_id, t.source
ORDER BY n_overlapping_grams DESC, doc_id
""",
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM-style n-gram
    overlap check): flag training documents sharing any 4-gram with
    the eval set, with the overlap count as evidence. Eval set here
    = fixture source 'src1'.

    Plan: eval grams are DISTINCT and broadcast (an eval benchmark
    is KB-to-MB at any corpus scale); train side streams through one
    scan -> explode -> broadcast-hash-join -> groupBy(doc_id). The
    shuffle carries (doc_id, gram) for MATCHED grams only — at 100 TB
    that is proportional to contamination, not corpus size.
    """
    t = tables(spark, sf_dir)
    grams = t.documents.select(
        "doc_id", "source",
        F.explode(_word_ngrams("text", _DECONTAM_WIDTH)).alias("g"),
    )
    eval_grams = (
        grams.filter(F.col("source") == _EVAL_SOURCE).select("g").distinct()
    )
    train = grams.filter(F.col("source") != _EVAL_SOURCE)
    return (
        train.join(F.broadcast(eval_grams), "g")
        # plain count, not count_distinct: grams are array_distinct
        # per document BEFORE the explode, so (doc_id, g) is already
        # unique within each group and a distinct-aggregation pass
        # over the matched grams would be pure wasted shuffle work.
        .groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_overlapping_grams"))
        .orderBy(F.desc("n_overlapping_grams"), "doc_id")
    )


@register(
    "text_boilerplate_ngrams",
    tags=("llm", "text"),
    oracle=f"""
WITH grams AS ({_ngram_cte(_BOILER_WIDTH)})
SELECT g AS gram, COUNT(*) AS n_docs
FROM grams
GROUP BY g
HAVING COUNT(*) > 1
ORDER BY n_docs DESC, gram
LIMIT 15
""",
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: n-grams appearing in many documents
    (header/footer/cookie-banner candidates in a web corpus). Grams
    are distinct per doc, so the count is a document frequency. One
    groupBy keyed on the gram; at scale the gram would be hashed
    first so the shuffle carries 8-byte keys (cf. dedup_exact)."""
    t = tables(spark, sf_dir)
    grams = t.documents.select(
        F.explode(_word_ngrams("text", _BOILER_WIDTH)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .orderBy(F.desc("n_docs"), "gram")
        .limit(15)
    )


@register(
    "text_repetition_score",
    tags=("llm", "text"),
    oracle="""
SELECT doc_id,
       n_grams,
       n_distinct,
       CAST(1.0 - CAST(n_distinct AS DOUBLE) / n_grams AS DOUBLE) AS repetition
FROM (
  SELECT doc_id,
         len(parts) - 2 AS n_grams,
         len(list_distinct([array_to_string(parts[i:i+2], ' ')
              FOR i IN range(1, len(parts) - 1)])) AS n_distinct
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS parts FROM documents)
  WHERE len(parts) >= 3
) d
WHERE doc_id % 10 = 1
ORDER BY doc_id
""",
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (Gopher's repetition rules): 1 -
    distinct/total 3-grams. High values mark degenerate/templated
    text. Pure projection — no shuffle, linear scan at any scale."""
    t = tables(spark, sf_dir)
    toks = F.split(F.lower(F.col("text")), " ")
    return (
        t.documents.filter(F.size(toks) >= 3)
        .select(
            "doc_id",
            (F.size(toks) - 2).alias("n_grams"),
            # the guarded shared helper — an unguarded inline copy
            # previously relied on the filter above staying physically
            # upstream to avoid the negative-sequence slice error
            F.size(_word_ngrams("text", 3)).alias("n_distinct"),
        )
        .filter(F.col("doc_id") % 10 == 1)
        .select(
            "doc_id",
            "n_grams",
            "n_distinct",
            (1.0 - F.col("n_distinct").cast("double") / F.col("n_grams")).alias("repetition"),
        )
        .orderBy("doc_id")
    )


@register(
    "pipeline_quality_filter",
    tags=("llm", "pipeline"),
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM (
  SELECT source,
         (len(string_split(text, ' ')) BETWEEN 20 AND 200)
         AND lang IN ('en', 'de', 'fr')
         AND n_chars >= 100 AS keep
  FROM documents
) d
GROUP BY source
ORDER BY source
""",
)
def pipeline_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compound filter stage every pipeline runs before
    training: token-count bounds AND language allowlist AND length
    floor, reported as per-source keep/drop counts (the audit a
    data-mixture owner reads). Stateless row predicate + one tiny
    rollup: filter pushes to the scan, audit shuffles one row per
    source."""
    t = tables(spark, sf_dir)
    keep = (
        F.size(F.split(F.col("text"), " ")).between(20, 200)
        & F.col("lang").isin("en", "de", "fr")
        & (F.col("n_chars") >= 100)
    )
    return (
        t.documents.select("source", keep.alias("keep"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("n_dropped"),
        )
        .orderBy("source")
    )
