"""Deduplication operators for training-data pipelines: exact
(hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash.

Beyond the reference surface (BASELINE.json north star). Design for
100 TB:

- **exact**: shuffle carries (md5, doc_id) — 24 bytes/row, never the
  text. One groupBy.
- **ngram-jaccard**: documents explode to distinct shingles; the
  shingle join's fan-out is bounded because only shingles shared by
  ≥2 docs produce pairs. For web-scale corpora the LSH variant below
  replaces the all-pairs shingle join.
- **minhash LSH**: signature = k minima of seeded xxhash64 over
  shingles (one scan, no shuffle); band buckets → candidate pairs
  (shuffle on 8-byte band keys only); exact Jaccard verification on
  the candidate set. This is the linear-ish scale path: cost tracks
  #near-duplicates, not #pairs.
- **simhash**: 64-bit signature from per-token hash bit votes;
  hamming-ball candidate search via band buckets on signature
  chunks.

MinHash/SimHash signatures use Spark's xxhash64 — engine-specific,
so those two queries carry no DuckDB oracle (rows-only driver
check); tests/test_llm_ops.py instead asserts recall of the exact
near-dup set computed by the oracled jaccard query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import register

_SHINGLE_WIDTH = 3
_MINHASH_PERMS = 16
_LSH_BANDS = 4  # 4 bands × 4 rows — candidates at jaccard ≳ 0.5


def _shingles(col: str = "text"):
    """Distinct word n-gram shingles of width 3 (joined by U+0001).

    Docs shorter than the shingle width yield an EMPTY array — without
    the guard ``sequence(0, size-3)`` auto-steps negative for short
    docs and ``slice(..., 0, ...)`` errors at runtime (and diverges
    from the oracle's empty range)."""
    toks = F.split(F.lower(F.col(col)), " ")
    return F.when(
        F.size(toks) >= _SHINGLE_WIDTH,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - _SHINGLE_WIDTH),
                lambda i: F.concat_ws("\x01", F.slice(toks, i + 1, _SHINGLE_WIDTH)),
            )
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))


@register(
    "dedup_exact",
    tags=("llm", "dedup"),
    oracle="""
SELECT text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_id
FROM (SELECT doc_id, md5(text) AS text_hash FROM documents) h
GROUP BY text_hash
HAVING COUNT(*) > 1
ORDER BY text_hash
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash: emit duplicate groups with the
    surviving (min) doc_id."""
    t = tables(spark, sf_dir)
    return (
        t.documents.select("doc_id", F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_id"))
        .filter(F.col("n_copies") > 1)
        .orderBy("text_hash")
    )


# Document-frequency cap: a stop-phrase shingle shared by 10⁵ docs
# would alone emit 10¹⁰ pairs. Shingles with df > cap are excluded
# from the metric — in BOTH engines, so the oracle still matches —
# making this "stop-shingle-filtered jaccard" (the standard web-dedup
# trick; at sf≤0.1 no shingle hits the cap so values are unchanged).
_JACCARD_DF_CAP = 200

_JACCARD_ORACLE = f"""
WITH shingled AS (
  SELECT doc_id,
         unnest(list_distinct([
           array_to_string(parts[i:i+{_SHINGLE_WIDTH - 1}], chr(1))
           FOR i IN range(1, len(parts) - {_SHINGLE_WIDTH - 2})
         ])) AS shingle
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS parts FROM documents)
),
freq AS (SELECT shingle, COUNT(*) AS df FROM shingled GROUP BY shingle),
kept AS (
  SELECT s.doc_id, s.shingle
  FROM shingled s JOIN freq f ON s.shingle = f.shingle
  WHERE f.df <= {_JACCARD_DF_CAP}
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM kept a JOIN kept b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT 20
"""


@register("dedup_ngram_jaccard", tags=("llm", "dedup"), oracle=_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity: top-20 most similar pairs.
    jaccard = |A∩B| / (|A|+|B|-|A∩B|) — integer counts, so the
    double is identical cross-engine.

    Pair generation is the grouped-members pattern (groupBy shingle →
    collect doc list → explode pairs), NOT a shingle self-join, with a
    df ≤ 200 guard: worst-case fan-out per shingle is bounded at
    cap²/2 instead of corpus². Same shape as the LSH bucket path.

    The cap is applied BEFORE collect_list via a count-only aggregate
    (map-side-combinable) joined back onto the shingle stream, so no
    aggregation buffer ever materializes a stop shingle's full doc
    list — a boilerplate shingle shared by 10⁸ docs at corpus scale
    would otherwise build one giant array in a single
    ObjectHashAggregate buffer before the post-hoc filter could drop
    it. Both shuffles hash on `shingle`, so the join is co-partitioned
    with the count and adds no third exchange of the wide stream.
    """
    t = tables(spark, sf_dir)
    shingled = t.documents.select(
        "doc_id", F.explode(_shingles()).alias("shingle")
    )
    # Row counts (duplicates kept — a shingle repeated within one doc
    # counts each occurrence, matching the oracle's COUNT(*)).
    freq = (
        shingled.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _JACCARD_DF_CAP)
    )
    members = (
        shingled.join(freq, "shingle")
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
    )
    # Per-doc shingle counts over the SAME capped shingle set the
    # intersection uses (metric stays a true jaccard on kept shingles).
    sizes = (
        members.select(F.explode("docs").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        members.filter(F.size("docs") >= 2)
        .select(
            F.explode(
                F.expr(
                    """
flatten(transform(sequence(2, size(docs)),
  i -> transform(sequence(1, i - 1),
    j -> struct(docs[j-1] AS doc_a, docs[i-1] AS doc_b))))
"""
                )
            ).alias("p")
        )
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(20)
    )


_MASK64 = (1 << 64) - 1
# Affine permutation constants (odd multipliers), seeded LCG — plan
# literals, deterministic across runs/executors.
def _perm_constants() -> tuple[list[int], list[int]]:
    state = 0x5DEECE66D
    a, b = [], []
    for _ in range(_MINHASH_PERMS):
        state = (state * 6364136223846793005 + 1442695040888963407) & _MASK64
        a.append(state | 1)
        state = (state * 6364136223846793005 + 1442695040888963407) & _MASK64
        b.append(state)
    return a, b


def minhash_signatures_arrow(docs: DataFrame) -> DataFrame:
    """(doc_id, sig: array<bigint>) via mapInPandas: per Arrow batch,
    shingle in Python, base-hash the shingle set once
    (pd.util.hash_array — siphash, deterministic), then k affine
    permutations ``(a_i·h + b_i) mod 2⁶⁴`` vectorized in numpy.

    This is the scale path for signature computation: the JVM
    higher-order-function variant below is pure Catalyst but its
    lambdas are interpreted per element (measured ~7× slower at
    sf0.1); here each batch is one numpy kernel. Same one-scan,
    no-shuffle shape."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    a_const, b_const = _perm_constants()
    a_arr = np.array(a_const, dtype=np.uint64).reshape(-1, 1)
    b_arr = np.array(b_const, dtype=np.uint64).reshape(-1, 1)
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("sig", ArrayType(LongType()))]
    )

    def gen(batches):
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = text.lower().split(" ")
                shingles = list({"\x01".join(toks[i : i + _SHINGLE_WIDTH])
                                 for i in range(len(toks) - _SHINGLE_WIDTH + 1)})
                if not shingles:
                    # Doc shorter than the shingle width: no signature
                    # (an empty min-reduction would error, and a
                    # sentinel sig would bucket all short docs together
                    # as false candidates).
                    continue
                h = pd.util.hash_array(np.array(shingles, dtype=object)).astype(np.uint64)
                perms = (a_arr * h + b_arr) & np.uint64(_MASK64)  # k × n
                ids.append(doc_id)
                sigs.append(perms.min(axis=1).astype(np.int64).tolist())
            # explicit dtypes: an all-short-docs batch yields empty
            # columns, which pandas would otherwise type float64 and
            # Arrow would refuse to cast to array<bigint>.
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "sig": pd.Series(sigs, dtype="object"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(gen, schema=schema)


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sig: array<bigint>) — k seeded-xxhash64 minima over
    the doc's shingle set. One scan, no shuffle.

    The shingle array and the per-shingle base hashes are
    materialized ONCE per row (projection steps) before the k-way
    min — inlining the shingle expression into each of the k
    transforms would re-tokenize the document k times (higher-order
    lambdas defeat common-subexpression elimination; measured 16×
    slower)."""
    hashed = (
        docs.select("doc_id", _shingles().alias("sh"))
        .filter(F.size("sh") > 0)  # short docs have no signature
        .select("doc_id", F.transform("sh", lambda s: F.xxhash64(s)).alias("h0"))
    )
    # Derive the k permutations from the one base hash per shingle
    # (cheap integer mix, not k string hashes).
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(_MINHASH_PERMS - 1)),
        lambda seed: F.array_min(F.transform("h0", lambda h: F.xxhash64(h, seed))),
    )
    return hashed.select("doc_id", sig.alias("sig"))


@register("dedup_minhash_lsh", tags=("llm", "dedup", "lsh"), oracle=None, bench=True)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup candidates, verified by exact
    Jaccard. Returns (doc_a, doc_b, est_jaccard, jaccard) for
    candidate pairs with exact jaccard ≥ 0.5.

    Pipeline: signature scan → explode to {_LSH_BANDS} band keys →
    self-join per band bucket (dedup pair set) → verify. The shuffle
    carries only (band_hash, doc_id); text is re-read just for the
    candidate pairs' verification join."""
    t = tables(spark, sf_dir)
    rows_per_band = _MINHASH_PERMS // _LSH_BANDS
    # persist() = the "signature table" a production pipeline writes
    # out; also an optimizer barrier — without it CollapseProject
    # inlines the signature expression into every band slice and the
    # corpus is re-hashed once per band (measured ~2×).
    sigs = minhash_signatures_arrow(t.documents).persist()
    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_LSH_BANDS - 1)),
                lambda band: F.struct(
                    band.alias("band"),
                    F.xxhash64(
                        F.concat_ws("_", F.slice("sig", band * rows_per_band + 1, rows_per_band)),
                        band,
                    ).alias("bucket"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", "sig", "bk.band", "bk.bucket")
    # Candidate generation: group each bucket and pair its members —
    # NOT a self-join. A self-join re-evaluates the whole signature
    # expression tree on both sides (measured 20×+ slower) and at
    # 100 TB would re-shingle the corpus twice; groupBy shuffles each
    # signature exactly once. Buckets larger than 200 members are
    # dropped (degenerate content; candidate count would be
    # quadratic) — the skew guard a web-scale dedup needs.
    buckets = (
        bands.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "sig"))).alias("members"))
        .filter((F.size("members") > 1) & (F.size("members") <= 200))
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    """
flatten(transform(sequence(2, size(members)),
  i -> transform(sequence(1, i - 1),
    j -> struct(members[j-1].doc_id AS doc_a, members[i-1].doc_id AS doc_b,
                members[j-1].sig AS sig_a, members[i-1].sig AS sig_b))))
"""
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b", "p.sig_a", "p.sig_b")
        .distinct()
    )
    est = cand.select(
        "doc_a",
        "doc_b",
        (
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda eq: eq,
                )
            ).cast("double")
            / _MINHASH_PERMS
        ).alias("est_jaccard"),
    )
    # Exact verification on the (small) candidate set.
    sh = t.documents.select("doc_id", _shingles().alias("sh"))
    va = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    vb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        est.join(va, "doc_a")
        .join(vb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "est_jaccard",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


@register("dedup_simhash", tags=("llm", "dedup", "lsh"), oracle=None)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 64-bit signature = sign of per-bit votes of
    token xxhash64 values; candidate pairs share one of 4 16-bit
    signature chunks (hamming-ball ≤3 guarantee needs all chunks
    equal-split: pairs within distance 3 share ≥1 chunk). Returns
    pairs with hamming distance ≤ 3."""
    t = tables(spark, sf_dir)
    docs = t.documents.select(
        "doc_id", F.array_distinct(F.split(F.lower(F.col("text")), " ")).alias("toks")
    )
    # vote(bit) = Σ_tokens (hash>>bit & 1 ? +1 : -1); sig bit = vote > 0.
    # SQL expr because shift amounts are per-element lambda variables
    # (the Python shiftleft/shiftright API only takes int literals).
    sig64 = F.expr(
        """
aggregate(
  sequence(0, 63),
  cast(0 as bigint),
  (acc, bit) -> acc + shiftleft(
      cast(aggregate(toks, 0, (a, w) ->
           a + IF((shiftright(xxhash64(w), bit) & 1) = 1, 1, -1)) > 0 as bigint),
      bit)
)
"""
    )
    packed = docs.select("doc_id", sig64.alias("sig64"))
    chunks = packed.select(
        "doc_id",
        "sig64",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), c -> "
                "struct(c AS chunk, (shiftright(sig64, c * 16) & 65535) AS val))"
            )
        ).alias("ck"),
    ).select("doc_id", "sig64", "ck.chunk", "ck.val")
    # Same groupBy-bucket pair generation as the MinHash path (no
    # self-join — see dedup_minhash_lsh).
    buckets = (
        chunks.groupBy("chunk", "val")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "sig64"))).alias("members"))
        .filter((F.size("members") > 1) & (F.size("members") <= 200))
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    """
flatten(transform(sequence(2, size(members)),
  i -> transform(sequence(1, i - 1),
    j -> struct(members[j-1].doc_id AS doc_a, members[i-1].doc_id AS doc_b,
                members[j-1].sig64 AS s_a, members[i-1].sig64 AS s_b))))
"""
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b", "p.s_a", "p.s_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("s_a").bitwiseXOR(F.col("s_b")))
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming_dist"))
        .filter(F.col("hamming_dist") <= 3)
        .orderBy("doc_a", "doc_b")
    )
