"""Training-data pipeline assembly ops: deterministic train/val/test
splitting, weighted source-mixture sampling, token-budget sequence
packing, and overlapped document chunking. Beyond the reference
surface (BASELINE.json north star) — the steps that turn a cleaned
corpus into model input.

All of them are *exactly* reproducible across engines, so every query
here carries a full DuckDB oracle — and since round 4 the hash-sketch
ops (minhash/simhash in llm/dedup.py) adopted the same bridge and are
oracled too. The portable hash bridge:
``md5`` produces identical hex in Spark and DuckDB; the first 15 hex
chars (60 bits) convert losslessly to BIGINT on both sides
(Spark ``conv(substring(md5(x),1,15),16,10)``, DuckDB
``('0x'||substr(md5(x),1,15))::BIGINT``).

Scale design (100 TB):

- **split**: one narrow projection — hash, bucket, label. No
  shuffle for assignment; the summary adds one small exchange.
  Splitting on the *content* hash (not doc_id) means byte-identical
  duplicates can never straddle train/test — eval contamination is
  impossible by construction, not by a cleanup pass. (Near-dups
  still need [[dedup]] upstream; see llm/dedup.py + components.py.)
- **mixture**: per-source keep-rate applied via the same doc-level
  hash — a filter, fully pushdown-friendly; no shuffle until the
  audit rollup. Rates live in a broadcastable config (here derived
  deterministically from the source name so the oracle can repeat
  it; a real run would join a literal weights table).
- **chunking**: pure per-row explode (doc → ~len/stride chunks),
  no shuffle at all — the map-side step Catalyst pipelines straight
  into the scan; the oracle checks every chunk's exact text via its
  md5.
- **packing**: documents get a stable order (lang, doc_id) and a
  running token total; bin id = prior-tokens ÷ budget. One window
  cumsum = one shuffle on the partition key. This is the
  split-allowed ("document concatenation") packing used by GPT-style
  pretraining loaders; greedy no-split packing is sessionization
  (see streaming/event_windows.py) and not needed for fixed-width
  context assembly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import register

# 60-bit portable hash bucket in [0, 100): identical in Spark & DuckDB.
_BUCKETS = 100
_TRAIN_PCT, _VAL_PCT = 80, 10  # train <80, val 80-89, test >=90
_PACK_BUDGET = 2048  # tokens per packed context window


def _hash_bucket(col, buckets: int = _BUCKETS):
    """Deterministic [0,buckets) bucket from md5 — portable across
    engines; _sql_bucket is its DuckDB twin, same idiom, so a change
    to the hash bridge lands in exactly two lines."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint") % buckets
    )


def _sql_bucket(expr: str, buckets: int = _BUCKETS) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT % {buckets})"


@register(
    "pipeline_train_split",
    tags=("llm", "pipeline"),
    oracle=f"""
SELECT split, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc
FROM (
  SELECT doc_id, lang, text,
         CASE WHEN {_sql_bucket('text')} < {_TRAIN_PCT} THEN 'train'
              WHEN {_sql_bucket('text')} < {_TRAIN_PCT + _VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
) s
GROUP BY split, lang
ORDER BY split, lang
""",
)
def pipeline_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash train/val/test assignment + per-split audit.
    Hashing the text (not the id) pins exact duplicates to one
    split — no eval leakage from byte-identical docs."""
    t = tables(spark, sf_dir)
    b = _hash_bucket(F.col("text"))
    split = (
        F.when(b < _TRAIN_PCT, F.lit("train"))
        .when(b < _TRAIN_PCT + _VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        t.documents.select("doc_id", "lang", "text", split.alias("split"))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("split", "lang")
    )


@register(
    "pipeline_mixture_sample",
    tags=("llm", "pipeline"),
    oracle=f"""
SELECT source,
       ({_sql_bucket('source')} % 50) + 25 AS keep_pct,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN {_sql_bucket("text || '|mix'")}
                  < ({_sql_bucket('source')} % 50) + 25
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents
GROUP BY source
ORDER BY source
""",
)
def pipeline_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted downsampling (domain mixture weights) via
    the doc-level hash, salted ('|mix') so mixture keep/drop is
    independent of the train/val/test bucket. Returns the audit
    table: configured rate vs realized kept count per source."""
    t = tables(spark, sf_dir)
    keep_pct = (_hash_bucket(F.col("source")) % 50) + 25
    kept = _hash_bucket(F.concat(F.col("text"), F.lit("|mix"))) < keep_pct
    return (
        t.documents.select("source", keep_pct.alias("keep_pct"), kept.alias("kept"))
        .groupBy("source", "keep_pct")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
        )
        .orderBy("source")
    )


@register(
    "pipeline_pack_sequences",
    tags=("llm", "pipeline"),
    oracle=f"""
SELECT lang, bin,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM (
  SELECT lang, doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // {_PACK_BUDGET} AS BIGINT) AS bin
  FROM (SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents) d
) b
GROUP BY lang, bin
ORDER BY lang, bin
""",
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget context packing: stable (lang, doc_id) order,
    running token count, bin = prior-tokens ÷ budget (documents may
    straddle bins — concatenate-then-chunk semantics). One window
    cumsum; bins then aggregate into a manifest of (bin, docs,
    tokens) a loader can fetch."""
    t = tables(spark, sf_dir)
    d = t.documents.select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = d.withColumn(
        "bin",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / _PACK_BUDGET),
    )
    return (
        binned.groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "bin")
    )


# --- document chunking (round 4) -----------------------------------
_CHUNK_TOKENS = 64
_CHUNK_OVERLAP = 16  # stride = 48


@register(
    "pipeline_chunk_documents",
    tags=("llm", "pipeline"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
idx AS (
  -- chunk-index bound derived from the document's own length (last
  -- valid idx satisfies idx*stride < len, so len//stride covers it);
  -- no fixed cap, so an arbitrarily long document keeps its tail.
  SELECT doc_id, t, len(t) AS doc_tokens,
         unnest(range(0, len(t) // {_CHUNK_TOKENS - _CHUNK_OVERLAP} + 1)) AS chunk_idx
  FROM toks
),
chunks AS (
  SELECT doc_id, doc_tokens, chunk_idx,
         array_to_string(
           t[chunk_idx * {_CHUNK_TOKENS - _CHUNK_OVERLAP} + 1 :
             chunk_idx * {_CHUNK_TOKENS - _CHUNK_OVERLAP} + {_CHUNK_TOKENS}], ' ') AS chunk_text
  FROM idx
  WHERE chunk_idx * {_CHUNK_TOKENS - _CHUNK_OVERLAP} < doc_tokens
    AND (chunk_idx = 0 OR chunk_idx * {_CHUNK_TOKENS - _CHUNK_OVERLAP} + {_CHUNK_OVERLAP} < doc_tokens)
)
SELECT doc_id, chunk_idx,
       CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS chunk_tokens,
       md5(chunk_text) AS chunk_hash,
       doc_tokens
FROM chunks
ORDER BY doc_id, chunk_idx
""",
)
def pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget document chunking with overlap — the step that
    turns cleaned documents into training-window-sized pieces:
    chunks of 64 tokens with 16-token overlap (stride 48). A
    trailing chunk that would consist ONLY of overlap (fully
    contained in its predecessor) is suppressed. Emits
    (doc_id, chunk_idx, chunk_tokens, chunk_hash, doc_tokens) — the
    hash stands in for the chunk payload so the oracle verifies the
    exact text of every chunk without hauling it through the driver.

    Scale shape: pure per-row explode — no shuffle at all until a
    downstream consumer groups; chunk fan-out is bounded by
    doc_len/stride. At 100 TB this is the map-side step before
    pack/shuffle, and Catalyst pipelines it into the scan."""
    t = tables(spark, sf_dir)
    stride = _CHUNK_TOKENS - _CHUNK_OVERLAP
    toks = t.documents.select(
        "doc_id", F.split("text", " ").alias("t")
    ).withColumn("doc_tokens", F.size("t"))
    chunks = toks.select(
        "doc_id",
        "doc_tokens",
        F.explode(
            F.filter(
                F.transform(
                    # Bound derived from doc_tokens, not a fixed cap
                    # (advice r4): floor(len/stride) >= every valid
                    # chunk_idx, so long documents keep their tails.
                    F.sequence(
                        F.lit(0),
                        F.floor(F.col("doc_tokens") / stride).cast("int"),
                    ),
                    lambda c: F.struct(
                        c.alias("chunk_idx"),
                        F.concat_ws(
                            " ", F.slice("t", c * stride + 1, _CHUNK_TOKENS)
                        ).alias("chunk_text"),
                    ),
                ),
                lambda s: (s["chunk_idx"] * stride < F.col("doc_tokens"))
                & (
                    (s["chunk_idx"] == 0)
                    | (s["chunk_idx"] * stride + _CHUNK_OVERLAP < F.col("doc_tokens"))
                ),
            )
        ).alias("ch"),
    )
    return chunks.select(
        "doc_id",
        F.col("ch.chunk_idx").alias("chunk_idx"),
        F.size(F.split("ch.chunk_text", " ")).cast("bigint").alias("chunk_tokens"),
        F.md5("ch.chunk_text").alias("chunk_hash"),
        "doc_tokens",
    ).orderBy("doc_id", "chunk_idx")


@register(
    "pipeline_epoch_shuffle",
    tags=("llm", "pipeline"),
    oracle="""
WITH keyed AS (
  SELECT e.epoch, d.doc_id,
         md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)) AS ord
  FROM documents d, (SELECT unnest([0, 1, 2]) AS epoch) e
)
SELECT epoch, rank, doc_id, ord FROM (
  SELECT epoch, doc_id, ord,
         ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY ord) AS rank
  FROM keyed
) r WHERE rank <= 10
ORDER BY epoch, rank
""",
)
def pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch example ordering: training runs want a
    DIFFERENT shuffle of the corpus each epoch that is nevertheless
    reproducible from (epoch, doc_id) alone — no RNG state to
    checkpoint, any worker can compute any example's position. Order
    key = md5(epoch ':' doc_id); the audit returns each epoch's first
    10 examples, proving the orders differ across epochs and are
    stable within one.

    Scale shape: the key is a pure projection; per-epoch ordering is
    a window over the epoch partition. At 100 TB a real run sorts
    each epoch's shard-range by the same key — one shuffle per epoch,
    embarrassingly partitionable, with no coordinator state."""
    t = tables(spark, sf_dir)
    epochs = spark.range(3).select(F.col("id").cast("int").alias("epoch"))
    keyed = t.documents.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat(
                F.col("epoch").cast("string"), F.lit(":"), F.col("doc_id").cast("string")
            )
        ).alias("ord"),
    )
    w = Window.partitionBy("epoch").orderBy("ord")
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("epoch", "rank", "doc_id", "ord")
        .orderBy("epoch", "rank")
    )


@register(
    "pipeline_domain_quota",
    tags=("llm", "pipeline"),
    oracle="""
WITH scored AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
ranked AS (
  SELECT source, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY n_tokens DESC, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM scored
)
SELECT source,
       COUNT(*)        AS n_docs_kept,
       SUM(n_tokens)   AS tokens_kept,
       MAX(cum_tokens) AS budget_used
FROM ranked
WHERE cum_tokens - n_tokens < 800
GROUP BY source
ORDER BY source
""",
)
def pipeline_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain token budgeting: every source (domain) may
    contribute at most ~800 tokens to the training mix; docs are
    admitted longest-first (the deterministic stand-in for a quality
    rank) until the running total crosses the budget. This is the
    mixture-balancing step that stops one crawl domain from swamping
    an epoch — the quota analogue of the reference's per-group
    windowing (ql/exec/PTFOperator.java:46 running aggregates).

    Admission rule: a doc is kept iff the budget was not yet spent
    BEFORE it (cum - own < quota), so the first doc of every source
    always survives and the total may overshoot by at most one doc —
    the standard greedy knapsack-prefix semantics, identical in both
    engines because the (n_tokens DESC, doc_id) order is total.

    Scale shape: token counting is a pure projection; ONE
    hash(source) exchange drives the running-sum window; the rollup
    reuses the same partitioning (zero extra shuffle — Catalyst
    collapses groupBy(source) into the window's exchange). Skewed
    domains are bounded by the quota itself: the window sort is
    per-source and the output is #sources rows."""
    t = tables(spark, sf_dir)
    scored = t.documents.select(
        "source", "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_tokens"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return (
        ranked.filter(F.col("cum_tokens") - F.col("n_tokens") < 800)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tokens").alias("tokens_kept"),
            F.max("cum_tokens").alias("budget_used"),
        )
        .orderBy("source")
    )


@register(
    "pipeline_interleave_sources",
    tags=("llm", "pipeline"),
    oracle="""
WITH ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rnk
  FROM documents
),
ordered AS (
  SELECT source, doc_id, rnk,
         ROW_NUMBER() OVER (ORDER BY rnk, source, doc_id) AS position
  FROM ranked WHERE rnk <= 10
)
SELECT position, source, doc_id FROM ordered
WHERE position <= 40
ORDER BY position
""",
)
def pipeline_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-robin source interleaving: the global training order
    visits every source once before revisiting any (subject to
    exhaustion), with a per-source order that is itself a
    deterministic md5 shuffle — the schedule that keeps a batch from
    being a solid block of one domain without any RNG state to
    checkpoint. Audit returns the first 40 global positions.

    Scale shape: per-source rank is one hash(source) window exchange.
    The global-position window is UNpartitioned (single-partition
    sort — the classic scale trap), so the audit prefilters rnk <= 10
    first: position orders by rnk before anything else and 40
    positions span at most ceil(40 / #sources) <= 10 ranks for the
    fixture's >= 4 sources, so no row with rnk > 10 can land in the
    audited prefix, and the unpartitioned window sees at most
    10 x #sources rows regardless of corpus size. The bound sits
    BELOW the fixture's 25 docs per source, so the prefilter
    actually removes rows on the gate data instead of being a
    vacuous identity. A full-corpus interleave would instead write
    ordered by (rnk, source) with a range exchange and never ask for
    a single global row_number."""
    t = tables(spark, sf_dir)
    w_src = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    ranked = t.documents.select(
        "source", "doc_id", F.row_number().over(w_src).alias("rnk")
    ).filter(F.col("rnk") <= 10)
    w_glob = Window.orderBy("rnk", "source", "doc_id")
    return (
        ranked.withColumn("position", F.row_number().over(w_glob))
        .filter(F.col("position") <= 40)
        .select("position", "source", "doc_id")
        .orderBy("position")
    )


_EPOCH_MILLIS = 1000  # fractional-epoch resolution (tenths of a percent)


@register(
    "pipeline_epoch_mixture",
    tags=("llm", "pipeline"),
    oracle=f"""
WITH totals AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY source
),
plan AS (
  SELECT t.source, t.n_docs, t.total_chars,
         (g.target // t.total_chars) AS full_epochs,
         (((g.target % t.total_chars) * {_EPOCH_MILLIS}) // t.total_chars)
           AS keep_millis
  FROM totals t, (SELECT MAX(total_chars) AS target FROM totals) g
),
sampled AS (
  SELECT d.source, COUNT(*) AS sampled_docs
  FROM documents d JOIN plan p ON d.source = p.source
  WHERE {_sql_bucket("d.text || '|epoch'", _EPOCH_MILLIS)} < p.keep_millis
  GROUP BY d.source
)
SELECT p.source, p.n_docs, p.total_chars, p.full_epochs, p.keep_millis,
       CAST(COALESCE(s.sampled_docs, 0) AS BIGINT) AS sampled_docs,
       CAST(p.full_epochs * p.n_docs + COALESCE(s.sampled_docs, 0) AS BIGINT)
         AS planned_docs
FROM plan p LEFT JOIN sampled s ON s.source = p.source
ORDER BY p.source
""",
)
def pipeline_epoch_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epochs-and-fractions source balancing — the standard LLM data
    recipe move: every source (domain) is UPsampled to the largest
    source's character count, expressed as ``full_epochs`` complete
    passes plus a fractional pass that keeps each doc iff its
    content-hash bucket (0-{_EPOCH_MILLIS}) falls under
    ``keep_millis``. Hash-gated fractions mean the partial epoch is a
    deterministic, checkpoint-free subset (re-running selects the
    SAME docs), and upsampling by repeat factor rather than RNG draws
    keeps the plan reproducible across engines — the audit returns
    the per-source plan with its realized fractional-pass count.

    Integer arithmetic throughout: ``//`` floor-division on positive
    BIGINTs matches Spark's ``DIV``, the md5-prefix bucket is the
    shared portable-hash idiom (_hash_bucket at
    {_EPOCH_MILLIS}-bucket resolution), so the plan replays exactly
    in DuckDB.

    Scale shape: two column-pruned scans — one (source, n_chars)
    aggregation for totals (#sources rows; the MAX is a 1-row
    broadcast), one scan computing the md5 bucket with the per-source
    keep_millis broadcast-joined in. No window, no text shuffle; the
    expansion itself (full_epochs x corpus + the hash-filtered
    remainder) is a UNION of narrow scans a real run streams straight
    to the trainer."""
    t = tables(spark, sf_dir)
    totals = t.documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    target = totals.agg(F.max("total_chars").alias("target"))
    plan = totals.crossJoin(F.broadcast(target)).select(
        "source", "n_docs", "total_chars",
        F.expr("target DIV total_chars").alias("full_epochs"),
        F.expr(
            f"((target % total_chars) * {_EPOCH_MILLIS}) DIV total_chars"
        ).alias("keep_millis"),
    )
    bucket = _hash_bucket(
        F.concat(F.col("text"), F.lit("|epoch")), _EPOCH_MILLIS
    )
    sampled = (
        t.documents.select("source", bucket.alias("b"))
        .join(F.broadcast(plan.select("source", "keep_millis")), "source")
        .filter(F.col("b") < F.col("keep_millis"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("sampled_docs"))
    )
    # both sides are #sources rows, but Spark lacks stats for the
    # aggregated sampled side — broadcast it explicitly or the final
    # join sort-merges 20 rows through a full shuffle
    return (
        plan.join(F.broadcast(sampled), "source", "left")
        .select(
            "source", "n_docs", "total_chars", "full_epochs", "keep_millis",
            F.coalesce("sampled_docs", F.lit(0)).cast("bigint").alias("sampled_docs"),
            (
                F.col("full_epochs") * F.col("n_docs")
                + F.coalesce("sampled_docs", F.lit(0))
            ).cast("bigint").alias("planned_docs"),
        )
        .orderBy("source")
    )
