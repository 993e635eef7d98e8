"""Text analysis for training-data pipelines: token stats, quality
scoring, document fingerprinting, language ID.

Beyond the reference surface (BASELINE.json north star): these are
the per-document scoring passes an LLM data pipeline runs before
dedup/filtering. Everything except langid is built-in Catalyst
expressions — split/regexp/higher-order array functions — no Python
in the row path, so per-doc metrics run as a single scan with no
shuffle at any scale; corpus rollups add one small exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import register

# Tiny stopword list — deterministic, shared verbatim with oracles.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]
_SQL_STOPLIST = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


@register(
    "text_token_stats",
    tags=("llm", "text"),
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       length(text)                 AS n_chars_measured,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       CAST(length(replace(text, ' ', '')) AS DOUBLE)
         / len(string_split(text, ' '))           AS avg_token_len
FROM documents
WHERE doc_id % 25 = 3
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + type/token stats. Pure projection:
    no shuffle, scales linearly."""
    t = tables(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    return t.documents.filter(F.col("doc_id") % 25 == 3).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(toks)
        ).alias("avg_token_len"),
    )


@register(
    "text_quality_score",
    bench=True,
    tags=("llm", "text"),
    oracle=f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN stop_ratio >= 0.05 AND n_tokens >= 30 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quality_docs,
       MIN(n_tokens) AS min_tokens,
       MAX(n_tokens) AS max_tokens
FROM (
  SELECT lang,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> list_contains({_SQL_STOPLIST}, w))) AS DOUBLE)
           / len(string_split(text, ' ')) AS stop_ratio
  FROM documents
) d
GROUP BY lang
ORDER BY lang
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality gate (stopword ratio + length floor) — the
    C4/Gopher-style rule family. Higher-order array functions keep
    the token scan JVM-side; the rollup exchanges 5 rows."""
    t = tables(spark, sf_dir)
    # r14: tokenize ONCE in its own projection — the inline form split
    # the text three times per row (size ×2 + filter input; multi-
    # referenced non-trivial aliases stay in their own Project, so the
    # split is evaluated once per document)
    scored = t.documents.select(
        "lang", F.split(F.col("text"), " ").alias("toks")
    ).select(
        "lang",
        F.size("toks").alias("n_tokens"),
        (
            F.size(F.filter(F.col("toks"), lambda w: w.isin(*STOPWORDS))).cast("double")
            / F.size("toks")
        ).alias("stop_ratio"),
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when((F.col("stop_ratio") >= 0.05) & (F.col("n_tokens") >= 30), 1).otherwise(0)
            ).alias("n_quality_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("lang")
    )


@register(
    "text_fingerprint",
    tags=("llm", "text", "dedup"),
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000000, upper(text) || '!!!'
  FROM documents WHERE doc_id % 97 = 0
)
SELECT fingerprint, COUNT(*) AS n_docs, MIN(doc_id) AS keeper_id
FROM (
  SELECT doc_id,
         md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fingerprint
  FROM corpus
) f
GROUP BY fingerprint
HAVING COUNT(*) > 1
ORDER BY fingerprint
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint (lowercase, strip non-alnum,
    md5) — catches formatting-only duplicates. One groupBy on the
    16-byte fingerprint; the shuffle carries (hash, id), not text.

    The corpus unions a deterministic planted variant (every 97th doc
    re-cased + punctuated, id-offset) built inside the query's own
    relational construction and mirrored in the oracle, so the
    formatting-only-duplicate groups EXIST at every SF — the raw
    documents table has none and the unplanted form certified on zero
    rows (the r9/r11 vacuity lesson, same fix as dedup_exact r10)."""
    t = tables(spark, sf_dir)
    base = t.documents.select("doc_id", "text")
    variants = base.filter("doc_id % 97 = 0").select(
        (F.col("doc_id") + F.lit(1000000000)).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit("!!!")).alias("text"),
    )
    corpus = base.unionByName(variants)
    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""))
    return (
        corpus.select(F.col("doc_id"), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_id"))
        .filter(F.col("n_docs") > 1)
        .orderBy("fingerprint")
    )


_LANGID_ORACLE = """
WITH docs AS (SELECT doc_id, lang, lower(text) AS txt FROM documents),
bigrams AS (
  SELECT doc_id, lang,
         unnest([substr(txt, i, 2) FOR i IN range(1, length(txt))]) AS bigram
  FROM docs
),
profile AS (
  SELECT lang AS p_lang, bigram, COUNT(*) AS n FROM bigrams GROUP BY lang, bigram
),
totals AS (SELECT p_lang, CAST(SUM(n) AS BIGINT) AS total FROM profile GROUP BY p_lang),
scored AS (
  SELECT b.doc_id, b.lang, p.p_lang, CAST(SUM(p.n) AS BIGINT) AS matched
  FROM bigrams b JOIN profile p ON b.bigram = p.bigram
  GROUP BY b.doc_id, b.lang, p.p_lang
),
ranked AS (
  SELECT s.doc_id, s.lang, s.p_lang,
         ROW_NUMBER() OVER (PARTITION BY s.doc_id
                            ORDER BY CAST(s.matched AS DOUBLE) / t.total DESC, s.p_lang) AS rn
  FROM scored s JOIN totals t ON t.p_lang = s.p_lang
)
SELECT doc_id, lang AS label, p_lang AS predicted FROM ranked WHERE rn = 1
ORDER BY doc_id
"""


@register("text_langid", tags=("llm", "text"), oracle=_LANGID_ORACLE)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram-profile language ID. Mechanism: build one
    bigram frequency profile per labeled language (training pass =
    explode + groupBy), broadcast the profiles, score each document
    by summed profile weight of its bigrams, argmax over languages.

    The driver's synthetic corpus draws every language from the same
    vocabulary, so *accuracy* is meaningless here (labels are
    random); the unit test asserts mechanism properties instead
    (deterministic prediction, full coverage, valid lang codes).

    The score is kept EXACT so the argmax is portable (round-4: this
    converted the query from rows-only to fully oracled): per-lang
    weights share the language's total as a common denominator, so
    Σ weights = (Σ matched bigram counts) / total — an integer sum
    and ONE double division, bit-identical cross-engine, instead of
    a float accumulation whose association order isn't.

    Scale: profiles are a few-KB broadcast; scoring is one
    explode+join+groupBy over bigrams — shuffle keyed on doc_id."""
    t = tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "lang", F.lower("text").alias("txt"))
    # Short-doc guard: sequence(1, length-1) auto-steps DOWNWARD for
    # docs under 2 chars, emitting bogus bigrams the oracle's
    # range(1, length) never produces (the same descending-sequence
    # hazard _shingles in llm/dedup.py pins) — and since the profile
    # is global, one short doc would skew every document's scores.
    bigrams = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.when(
                F.length("txt") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.length("txt") - 1),
                    lambda i: F.col("txt").substr(i, F.lit(2)),
                ),
            ).otherwise(F.expr("array()").cast("array<string>"))
        ).alias("bigram"),
    )
    profile = (
        bigrams.groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("lang").alias("p_lang"), "bigram", "n")
    )
    totals = profile.groupBy("p_lang").agg(F.sum("n").cast("bigint").alias("total"))
    scored = (
        bigrams.join(F.broadcast(profile), "bigram")
        .groupBy("doc_id", "lang", "p_lang")
        .agg(F.sum("n").cast("bigint").alias("matched"))
        .join(F.broadcast(totals), "p_lang")
        .withColumn("score", F.col("matched").cast("double") / F.col("total"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "p_lang")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("label"), F.col("p_lang").alias("predicted"))
        .orderBy("doc_id")
    )


# GPT-2-style pretokenizer classes, restricted to a portable regex
# (same RE2/Java-compatible text in both engines): word runs, digit
# runs, punctuation runs — each with optional leading space.
_BPE_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


@register(
    "text_bpe_token_count",
    tags=("llm", "text"),
    oracle=f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS n_bpe_pretokens,
       len(string_split(text, ' '))                    AS n_ws_tokens,
       CAST(length(text) AS DOUBLE)
         / nullif(len(regexp_extract_all(text, '{_BPE_PATTERN}')), 0) AS chars_per_token
FROM documents
WHERE doc_id % 25 = 11
ORDER BY doc_id
""",
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: pretokenize with the GPT-2-style
    class regex (word/digit/punct runs with optional leading space)
    and count pretokens — the budget estimate pipelines use before a
    real tokenizer pass. chars/token is the compression-rate proxy.
    regexp_extract_all is a JVM expression: one scan, no shuffle, no
    Python."""
    t = tables(spark, sf_dir)
    pretoks = F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)
    return (
        t.documents.filter(F.col("doc_id") % 25 == 11)
        .select(
            "doc_id",
            F.size(pretoks).alias("n_bpe_pretokens"),
            F.size(F.split(F.col("text"), " ")).alias("n_ws_tokens"),
            # nullif guard: an empty doc has zero pretokens; without it
            # Spark non-ANSI yields NULL but DuckDB IEEE-divides to
            # NaN/Inf — both engines must agree on NULL.
            (
                F.length("text").cast("double")
                / F.nullif(F.size(pretoks), F.lit(0))
            ).alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )


# Redaction patterns. Both are written in the Java∩RE2 common regex
# subset (character classes, alternation, \b, bounded repetition — no
# backreferences/lookaround, which RE2 lacks) so Spark's Java engine
# and DuckDB's RE2 match identically.
_BLOCKLIST_PATTERN = r"\b(customer|vector|spark)\b"
_EMAIL_PATTERN = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_REDACTED = "<SCRUBBED>"


@register(
    "text_scrub_blocklist",
    tags=("llm", "text", "redaction"),
    oracle=f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BLOCKLIST_PATTERN}')) AS n_term_hits,
       len(regexp_extract_all(text, '{_EMAIL_PATTERN}'))     AS n_pii_hits,
       md5(regexp_replace(text, '{_BLOCKLIST_PATTERN}', '{_REDACTED}', 'g'))
         AS scrubbed_hash,
       length(regexp_replace(text, '{_BLOCKLIST_PATTERN}', '{_REDACTED}', 'g'))
         - length(text) AS len_delta
FROM documents
WHERE doc_id % 25 = 19
ORDER BY doc_id
""",
)
def text_scrub_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist/PII scrubbing — the redaction pass a training-data
    pipeline runs before packing (strip contaminating markers, mask
    PII). Reports per-doc hit counts for a term blocklist and an
    email-shaped PII pattern, plus the md5 of the scrubbed text so
    the oracle verifies the exact replacement output without moving
    payloads. The corpus contains no email-shaped tokens, so
    n_pii_hits verifying as 0 everywhere is itself the assertion that
    the pattern doesn't false-positive on clean text; the positive
    path is unit-tested on literal rows in tests/test_llm_ops.py.

    Scale: regexp_count/regexp_replace are JVM expressions — one
    scan, no shuffle, no Python; the filter prunes at the parquet
    scan."""
    t = tables(spark, sf_dir)
    scrubbed = F.regexp_replace("text", F.lit(_BLOCKLIST_PATTERN), F.lit(_REDACTED))
    return (
        t.documents.filter(F.col("doc_id") % 25 == 19)
        .select(
            "doc_id",
            F.regexp_count("text", F.lit(_BLOCKLIST_PATTERN)).alias("n_term_hits"),
            F.regexp_count("text", F.lit(_EMAIL_PATTERN)).alias("n_pii_hits"),
            F.md5(scrubbed).alias("scrubbed_hash"),
            (F.length(scrubbed) - F.length("text")).alias("len_delta"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_zipf_head",
    tags=("llm", "text"),
    oracle="""
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
counts AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
total AS (SELECT SUM(n) AS t FROM counts)
SELECT ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rank, tok, n,
       CAST(n AS DOUBLE) / (SELECT t FROM total) AS share
FROM counts
ORDER BY rank
LIMIT 15
""",
)
def text_zipf_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-frequency head: the top-15 tokens with counts and
    corpus share — the Zipf curve's head, which drives stopword lists
    and the df caps the dedup paths use.

    Scale shape: explode -> count is one shuffle with a map-side
    partial (the combiner collapses each partition to its local
    vocabulary before exchanging, so the shuffle carries vocab-sized
    data, not token-stream-sized); the total is a broadcast scalar
    join and the top-15 rank runs on the vocabulary frame."""
    t = tables(spark, sf_dir)
    counts = (
        t.documents.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("t"))
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).alias("rank"),
            "tok",
            "n",
            (F.col("n").cast("double") / F.col("t")).alias("share"),
        )
        .orderBy("rank")
        .limit(15)
    )


@register(
    "text_rare_token_score",
    tags=("llm", "text"),
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
  FROM documents
),
df AS (
  SELECT tok, COUNT(*) AS doc_freq FROM toks GROUP BY tok
)
SELECT t.doc_id,
       COUNT(*)                                            AS n_distinct,
       SUM(CASE WHEN d.doc_freq * 4 <= (SELECT COUNT(*) FROM documents)
                THEN 1 ELSE 0 END)                         AS n_rare,
       MIN(d.doc_freq)                                     AS min_df,
       MAX(d.doc_freq)                                     AS max_df
FROM toks t JOIN df d ON t.tok = d.tok
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
)
def text_rare_token_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rarity profile against the corpus-wide document
    frequency table: how many of a doc's distinct tokens appear in at
    most a quarter of all documents, plus its min/max df — the
    integer-arithmetic core of TF-IDF-style quality and outlier
    scoring (gibberish and boilerplate sit at the two df extremes).
    Deliberately all-integer: no log/idf floats to diverge
    cross-engine, and the threshold is RELATIVE (df·4 ≤ N) so it
    splits the df distribution at every corpus size — a fixed cutoff
    was vacuous on the gate fixture (no token had df ≤ 2) and left
    the rarity branch untested.

    Scale shape: explode distinct tokens (map-side list_distinct
    collapses within-doc repeats before anything moves), ONE shuffle
    on tok builds the vocabulary df frame, the df join is
    vocabulary-sized (AQE broadcasts it when small; at 100 TB it
    shuffle-joins on tok, co-partitioned with the explode), and the
    per-doc rollup collapses map-side on doc_id."""
    t = tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("tok"),
    )
    df = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = t.documents.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        toks.join(df, "tok")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(
                F.when(F.col("doc_freq") * 4 <= F.col("n_docs"), 1).otherwise(0)
            ).alias("n_rare"),
            F.min("doc_freq").alias("min_df"),
            F.max("doc_freq").alias("max_df"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_bigram_lm_score",
    tags=("llm", "text"),
    oracle="""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
idx AS (
  SELECT unnest(range(1, (SELECT MAX(len(string_split(text, ' ')))
                          FROM documents))) AS i
),
pairs AS (
  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
  FROM d, idx WHERE i + 1 <= len(toks)
),
ctx AS (SELECT w1, COUNT(*) AS cn FROM pairs GROUP BY w1),
big AS (SELECT w1, w2, COUNT(*) AS bn FROM pairs GROUP BY w1, w2),
scored AS (
  SELECT p.doc_id,
         (((1000000 * b.bn) - ((((1000000 * b.bn) % c.cn) + c.cn) % c.cn))
            // c.cn) AS s
  FROM pairs p
  JOIN big b ON p.w1 = b.w1 AND p.w2 = b.w2
  JOIN ctx c ON p.w1 = c.w1
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       ((SUM(s) - (((SUM(s) % COUNT(*)) + COUNT(*)) % COUNT(*))) // COUNT(*))
         AS lm_avg,
       MIN(s) AS lm_min
FROM scored
WHERE doc_id % 20 = 7
GROUP BY doc_id
""",
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model predictability score —
    the classic KenLM-style quality filter collapsed to its integer
    core: TRAIN bigram/context counts over the WHOLE corpus, then
    score each document by the floor(1e6·B(w1,w2)/C(w1)) conditional
    frequency of its own bigrams (average and minimum). Low averages
    flag unusual text; a low minimum flags one improbable junction
    (the signal perplexity filters act on). All arithmetic is exact
    BIGINT floor division (the portable truncating idiom
    similarity._floordiv_long pins), so training AND scoring replay
    exactly in the DuckDB oracle — no log-prob floats to diverge.

    Scale shape: bigram construction is a JVM-side indexed transform
    (no shuffle, no Python); the two count tables shuffle on their
    own keys with map-side partial aggregation; the score join hits
    `big` on the same (w1,w2) the count shuffle produced (AQE
    broadcasts both vocab-sized tables at this SF; at 100 TB they
    hash-join co-partitioned); the per-doc rollup is one doc_id
    exchange. The %-20 output gate is applied AFTER training — the
    model always sees the full corpus, like the real pipeline."""
    t = tables(spark, sf_dir)
    pairs = (
        t.documents.select(
            "doc_id", F.split(F.col("text"), " ").alias("toks")
        )
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks) - 1), "
                    "(w, i) -> struct(w AS w1, element_at(toks, i + 2) AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    ctx = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("cn"))
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bn"))
    from amplab_hive_spark.llm.similarity import _floordiv_long

    scored = (
        pairs.join(big, ["w1", "w2"])
        .join(ctx, ["w1"])
        .select("doc_id", _floordiv_long("1000000 * bn", "cn").alias("s"))
    )
    return (
        scored.filter(F.col("doc_id") % 20 == 7)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("s").alias("_ssum"),
            F.min("s").alias("lm_min"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            _floordiv_long("_ssum", "n_bigrams").alias("lm_avg"),
            "lm_min",
        )
    )


@register(
    "text_keyword_extraction",
    tags=("llm", "text"),
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents
),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks WHERE length(tok) >= 3
  GROUP BY doc_id, tok
),
df AS (
  SELECT tok, COUNT(*) AS doc_freq FROM (
    SELECT DISTINCT doc_id, tok FROM toks WHERE length(tok) >= 3
  ) GROUP BY tok
),
ranked AS (
  SELECT t.doc_id, t.tok, t.tf, d.doc_freq,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id
                            ORDER BY t.tf DESC, d.doc_freq ASC, t.tok) AS rnk
  FROM tf t JOIN df d ON t.tok = d.tok
)
SELECT doc_id, rnk, tok, tf, doc_freq FROM ranked WHERE rnk <= 3
ORDER BY doc_id, rnk
""",
)
def text_keyword_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 keywords — the TF-IDF family with an
    INTEGER-EXACT ranking: (term frequency DESC, document frequency
    ASC, token) instead of tf·log(N/df). For a fixed tf, 1/df and
    log(N/df) induce the same order, so the keyword set matches what
    float TF-IDF would pick whenever tf decides or rarity
    tie-breaks; what it deliberately gives up is CROSS-tf mixing
    (a tf=2/df=3 term can never outrank tf=3/df=390). That trade
    buys bit-exact cross-engine reproducibility — no platform libm
    in the ranking — which this repo's hash-match gate (and any
    deterministic rerun of a 100 TB pipeline) values over the
    blended score. The gate fixture exercises the tie-break for real
    (tf ties broken by df at every doc).

    Scale shape: one explode, tf collapses map-side on (doc_id, tok);
    df is one vocabulary-sized shuffle reused from the same explode;
    the df join co-partitions on tok (AQE broadcasts a small
    vocabulary); the per-doc top-3 window partitions on doc_id —
    nothing outside those keyed exchanges moves."""
    t = tables(spark, sf_dir)
    from pyspark.sql import Window

    toks = t.documents.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), " ")).alias("tok"),
    ).filter(F.length("tok") >= 3)
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = (
        toks.select("doc_id", "tok").distinct()
        .groupBy("tok").agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("doc_freq"), F.asc("tok")
    )
    return (
        tf.join(df, "tok")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "tok", "tf", "doc_freq")
        .orderBy("doc_id", "rnk")
    )
