"""Mechanism tests for the LLM-pipeline operators that have no SQL
oracle (LSH-based dedup/ANN, langid): recall against the exact
oracled variants, determinism, coverage.
"""

import pytest
from pyspark.sql import functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import all_queries

QUERIES = all_queries()


@pytest.fixture(scope="module")
def bruteforce_topk(spark, sf_dir):
    return QUERIES["sim_bruteforce_topk"].fn(spark, sf_dir).collect()


def test_minhash_lsh_finds_exact_dups(spark, sf_dir):
    """Every exact duplicate pair (jaccard 1.0) must be an LSH hit."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
        if r["jaccard"] == 1.0
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    }
    assert exact <= lsh
    # and every reported pair really is a near-dup (verified jaccard)
    for r in QUERIES["dedup_minhash_lsh"].fn(spark, sf_dir).collect():
        assert r["jaccard"] >= 0.5


def test_simhash_determinism_and_symmetry(spark, sf_dir):
    a = QUERIES["dedup_simhash"].fn(spark, sf_dir).collect()
    b = QUERIES["dedup_simhash"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    for r in a:
        assert r["doc_a"] < r["doc_b"]
        assert 0 <= r["hamming_dist"] <= 3


def test_ann_lsh_recall(spark, sf_dir, bruteforce_topk):
    """Multi-probe LSH top-10 recall vs exact top-10 ≥ 0.5 (8-bit
    signatures probe ~9/256 buckets ⇒ ~3.5% of candidates)."""
    exact: dict[int, set[int]] = {}
    for r in bruteforce_topk:
        exact.setdefault(r["qid"], set()).add(r["vec_id"])
    ann: dict[int, set[int]] = {}
    for r in QUERIES["sim_ann_lsh"].fn(spark, sf_dir).collect():
        ann.setdefault(r["qid"], set()).add(r["vec_id"])
    assert set(exact) == set(ann), "every query vector must get ANN results"
    recalls = [len(exact[q] & ann[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.5, f"mean recall too low: {recalls}"


def test_ann_ivf_recall(spark, sf_dir, bruteforce_topk):
    """IVF nprobe=20/32 after three Lloyd iterations, recall vs
    exact top-10: ≥0.9 mean (r8 sweep, experiments/ivf_sweep.py —
    measured 0.98/0.9 mean/min on the sf0.01 fixture and 0.88/0.7 at
    sf0.1, up from 0.88/0.6 and 0.795/0.5 at K=16/nprobe=8). The
    corpus is isotropic-random, IVF's worst case; real embedding
    corpora cluster and do far better at the same probed share."""
    exact: dict[int, set[int]] = {}
    for r in bruteforce_topk:
        exact.setdefault(r["qid"], set()).add(r["vec_id"])
    ivf: dict[int, set[int]] = {}
    for r in QUERIES["sim_ann_ivf"].fn(spark, sf_dir).collect():
        ivf.setdefault(r["qid"], set()).add(r["vec_id"])
    assert set(exact) == set(ivf)
    recalls = [len(exact[q] & ivf[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.9, f"mean recall too low: {recalls}"
    assert min(recalls) >= 0.7, f"min recall too low: {recalls}"


def test_langid_mechanism(spark, sf_dir):
    out = QUERIES["text_langid"].fn(spark, sf_dir).collect()
    n_docs = tables(spark, sf_dir).documents.count()
    assert len(out) == n_docs, "every document classified exactly once"
    langs = {"en", "es", "de", "fr", "zh"}
    assert {r["predicted"] for r in out} <= langs
    again = QUERIES["text_langid"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again)), "deterministic"


def test_multimodal_roundtrip_rowlevel(spark, sf_dir):
    """Header dims survive the binary encode → mapInPandas decode
    round-trip, row-for-row."""
    from amplab_hive_spark.llm.multimodal import (
        _FEATURE_SCHEMA,
        decode_media_batch,
        synthesize_media,
    )

    media = synthesize_media(spark, sf_dir)
    feats = media.mapInPandas(decode_media_batch, schema=_FEATURE_SCHEMA)
    rows = feats.filter(F.col("doc_id") % 97 == 1).collect()
    assert rows
    for r in rows:
        assert r["width"] == r["doc_id"] % 640 + 32
        assert r["height"] == r["doc_id"] % 480 + 24
        assert r["n_bytes"] > 8


def test_short_docs_yield_empty_shingles_and_no_signatures(spark):
    """Docs shorter than the shingle width (3 tokens) must produce an
    empty shingle array (not a runtime slice error) and be skipped by
    both minhash signature paths (ADVICE r1: latent short-doc bug)."""
    from pyspark.sql import functions as F

    from amplab_hive_spark.llm.dedup import (
        _shingles,
        minhash_signatures,
        minhash_signatures_arrow,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two words"), (4, "exactly three tokens"),
         (5, "a longer document with plenty of tokens here")],
        ["doc_id", "text"],
    )
    sizes = {r["doc_id"]: r["n"] for r in docs.select("doc_id", F.size(_shingles()).alias("n")).collect()}
    assert sizes[1] == 0 and sizes[2] == 0 and sizes[3] == 0
    assert sizes[4] == 1 and sizes[5] > 0

    for sigfn in (minhash_signatures, minhash_signatures_arrow):
        out = sigfn(docs).collect()
        ids = {r["doc_id"] for r in out}
        assert ids == {4, 5}, (sigfn.__name__, ids)
        assert all(len(r["sig"]) == 16 for r in out)


def test_minhash_signature_paths_bit_identical(spark, sf_dir):
    """The pure-JVM and Arrow signature paths must produce the SAME
    portable signature (both are the md5→60-bit bridge + affine
    perms mod 2⁶⁴ with unsigned min) — this equality is what lets the
    DuckDB oracle grade whichever path the query uses."""
    from amplab_hive_spark.catalog import tables
    from amplab_hive_spark.llm.dedup import (
        minhash_signatures,
        minhash_signatures_arrow,
    )

    docs = tables(spark, sf_dir).documents.limit(100)
    jvm = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    arrow = {r["doc_id"]: r["sig"] for r in minhash_signatures_arrow(docs).collect()}
    assert jvm == arrow


def test_neardup_bucketed_subset_and_planted_recall(spark, sf_dir):
    """The bucketed neardup must (a) report only pairs the exact
    all-pairs yardstick also reports, and (b) catch planted
    near-identical vectors (cos ≥ ~0.99 — the pairs the operator
    exists for) with high recall."""
    from pyspark.sql import functions as F

    from amplab_hive_spark.llm.similarity import (
        sim_embedding_neardup,
        sim_embedding_neardup_exact,
    )

    bucketed = {
        (r["vec_a"], r["vec_b"])
        for r in sim_embedding_neardup(spark, sf_dir).collect()
    }
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in sim_embedding_neardup_exact(spark, sf_dir).collect()
    }
    assert bucketed <= exact  # verification is exact: no false positives

    # Plant near-dups: clone 40 vectors with one coordinate nudged —
    # cosine ≈ 0.999, signs identical ⇒ every table's block matches.
    from amplab_hive_spark.catalog import tables

    base = tables(spark, sf_dir).embeddings
    clones = (
        base.filter(F.col("vec_id") % 12 == 0)
        .limit(40)
        .select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x * 1.0001).cast("float")
            ).alias("embedding"),
            "label",
        )
    )
    import amplab_hive_spark.llm.similarity as simmod

    # run the same pipeline body on the augmented table via monkeypatched tables()
    union_df = base.unionByName(clones)
    real_tables = simmod.tables
    try:
        class _T:
            embeddings = union_df

        simmod.tables = lambda _spark, _sf: _T
        got = {
            (r["vec_a"], r["vec_b"])
            for r in simmod.sim_embedding_neardup(spark, sf_dir).collect()
        }
    finally:
        simmod.tables = real_tables
    want = {
        (r["vec_id"], r["vec_id"] + 1_000_000)
        for r in base.filter(F.col("vec_id") % 12 == 0).limit(40).collect()
    }
    caught = want & got
    assert len(caught) >= 0.9 * len(want), (len(caught), len(want))


def test_neardup_bucketed_no_nested_loop(spark, sf_dir):
    """The graded neardup plan must be a bucket join, not an O(N²)
    BroadcastNestedLoopJoin/CartesianProduct over the corpus
    (round-2 verdict task 4)."""
    from amplab_hive_spark.llm.similarity import sim_embedding_neardup

    df = sim_embedding_neardup(spark, sf_dir)
    df.collect()  # let AQE finalize so the executed plan is real
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_scrub_patterns_positive_path(spark):
    """The corpus has no email-shaped tokens, so the registered
    query's n_pii_hits==0 only proves no false positives; this pins
    the positive path on literal rows — emails are counted and the
    blocklist replacement rewrites exactly the matched words."""
    from amplab_hive_spark.llm.text import (
        _BLOCKLIST_PATTERN,
        _EMAIL_PATTERN,
        _REDACTED,
    )

    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or alice.smith+x@mail.co today"),
            (2, "the customer saw a vector near spark and customers"),
            (3, "no hits here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.regexp_count("text", F.lit(_EMAIL_PATTERN)).alias("pii"),
            F.regexp_count("text", F.lit(_BLOCKLIST_PATTERN)).alias("terms"),
            F.regexp_replace(
                "text", F.lit(_BLOCKLIST_PATTERN), F.lit(_REDACTED)
            ).alias("scrubbed"),
        ).collect()
    }
    assert out[1]["pii"] == 2 and out[1]["terms"] == 0
    # \b keeps 'customers' intact (no partial-word scrub)
    assert out[2]["terms"] == 3
    assert (
        out[2]["scrubbed"]
        == f"the {_REDACTED} saw a {_REDACTED} near {_REDACTED} and customers"
    )
    assert out[3]["pii"] == 0 and out[3]["terms"] == 0


def test_retention_cohort_fixture(spark):
    """Hand-computed cohort matrix: users cohorted by first-activity
    week, each (cohort, offset) cell counting distinct active users —
    including a user with two events in one week (counted once) and a
    gap week (offset skipped, later offset still attributed)."""
    from amplab_hive_spark.streaming.event_windows import events_retention_cohorts

    from datetime import datetime

    df = spark.createDataFrame(
        [
            # user 1: first week Mon 2024-01-01, active offsets 0,1
            (1, datetime(2024, 1, 2, 10)),
            (1, datetime(2024, 1, 3, 11)),  # same week, distinct-collapsed
            (1, datetime(2024, 1, 8, 9)),
            # user 2: same cohort, active offsets 0 and 2 (gap at 1)
            (2, datetime(2024, 1, 5, 8)),
            (2, datetime(2024, 1, 16, 8)),
            # user 3: later cohort (week of 2024-01-08), offset 0 only
            (3, datetime(2024, 1, 10, 12)),
        ],
        "user_id long, ts timestamp",
    )
    import amplab_hive_spark.streaming.event_windows as ew

    class _T:
        events = df

    orig = ew.tables
    ew.tables = lambda s, d: _T()
    try:
        rows = {
            (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
            for r in events_retention_cohorts(spark, "unused").collect()
        }
    finally:
        ew.tables = orig
    assert rows == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_incremental_dedup_branches_not_vacuous(spark, sf_dir):
    """The incremental classifier must actually exercise its
    non-trivial branches on the gate fixture: the lead-fingerprint
    was chosen precisely because a full-text hash produced only
    'novel' (the fixture has no byte-identical duplicates). At the
    gate SF both dup_corpus and novel must appear."""
    from amplab_hive_spark.registry import all_queries

    rows = all_queries()["dedup_incremental_exact"].fn(spark, sf_dir).collect()
    statuses = {r.status for r in rows}
    assert "dup_corpus" in statuses, "corpus-duplicate branch untested"
    assert "novel" in statuses
    # classification is exhaustive and disjoint: batch total matches
    batch_total = sum(r.n for r in rows)
    from amplab_hive_spark.catalog import tables
    docs = tables(spark, sf_dir).documents
    assert batch_total == docs.filter("doc_id % 10 >= 8").count()


def _recall_vs_exact(spark, sf_dir, name: str):
    from collections import defaultdict

    from amplab_hive_spark.registry import all_queries

    qs = all_queries()
    ex, got = defaultdict(set), defaultdict(set)
    for r in qs["sim_bruteforce_topk"].fn(spark, sf_dir).collect():
        ex[r.qid].add(r.vec_id)
    for r in qs[name].fn(spark, sf_dir).collect():
        got[r.qid].add(r.vec_id)
    assert set(ex) == set(got), f"{name} must answer every query"
    return [len(ex[q] & got[q]) / len(ex[q]) for q in ex]


def test_pq_recall_floor(spark, sf_dir):
    """Trained-codebook PQ + exact-rerank recall@10 vs the exact
    cosine top-10. Round-6 (one Lloyd round per subspace): gate
    fixture 0.94 mean / 0.8 min; sf0.1 lifted 0.68->0.725 mean and
    0.2->0.4 min vs the round-5 seeded codebook. Floors raised from
    0.6/0.4 per the r5 verdict, with regeneration headroom (the
    fixture is isotropic — the hardest ANN regime)."""
    recalls = _recall_vs_exact(spark, sf_dir, "sim_ann_pq")
    assert sum(recalls) / len(recalls) >= 0.75, f"mean recall {recalls}"
    assert min(recalls) >= 0.6, f"min recall {recalls}"


def test_ivfpq_recall_floor(spark, sf_dir):
    """IVFPQ recall@10: bounded above by the IVF routing recall
    (a true neighbor in an unprobed cell is unreachable regardless
    of ADC quality) — measured EQUAL to sim_ann_ivf on the gate
    fixture. Round 7 lifted the routing ceiling per the r6 verdict
    (nprobe 6→8 + a third Lloyd round, chosen by the measured sweep
    in experiments/ann_composition_bench.py): gate fixture
    0.74/0.5 → 0.88/0.6 mean/min, sf0.1 0.68/0.4 → 0.745/0.5.
    Floors raised from the r6 0.6/0.4 to 0.8/0.5 with regeneration
    headroom (the fixture is isotropic — the hardest ANN regime)."""
    recalls = _recall_vs_exact(spark, sf_dir, "sim_ann_ivfpq")
    assert sum(recalls) / len(recalls) >= 0.8, f"mean recall {recalls}"
    assert min(recalls) >= 0.5, f"min recall {recalls}"

def test_incremental_dedup_dup_batch_branch(spark, tmp_path):
    """ADVICE r5: the dup_batch branch (first seen earlier IN THIS
    BATCH) never fires on the gate fixture — exercise it on a
    constructed documents table: two batch docs share a lead-8
    fingerprint absent from the corpus, one batch doc duplicates a
    corpus lead, one is novel. doc_id % 10 >= 8 is the batch slice."""
    from amplab_hive_spark.llm.dedup import dedup_incremental_exact

    corpus_lead = "alpha beta gamma delta epsilon zeta eta theta"
    batch_lead = "one two three four five six seven eight"
    rows = [
        # corpus (doc_id % 10 < 8)
        (1, corpus_lead + " corpus tail", "en", "web", 40),
        (2, "totally different corpus text goes here now ok", "en", "web", 40),
        # batch (doc_id % 10 >= 8)
        (8, batch_lead + " first copy", "en", "web", 40),    # novel (first seen)
        (18, batch_lead + " second copy", "en", "web", 40),  # dup_batch
        (9, corpus_lead + " reused lead", "en", "news", 40), # dup_corpus
        (19, "completely fresh batch document never seen before yes", "en", "news", 40),  # novel
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = dedup_incremental_exact(spark, str(tmp_path)).collect()
    got = {(r.source, r.status): r.n for r in out}
    assert got == {
        ("news", "dup_corpus"): 1,
        ("news", "novel"): 1,
        ("web", "dup_batch"): 1,
        ("web", "novel"): 1,
    }, f"all three branches must fire: {got}"
    # first-seen is by doc_id order: 8 is novel, 18 is the dup
    firsts = {(r.source, r.status): r.first_doc for r in out}
    assert firsts[("web", "dup_batch")] == 18
    assert firsts[("web", "novel")] == 8


def test_matryoshka_audit_not_vacuous(spark, sf_dir):
    """The prefix/full overlap must actually vary on the fixture —
    all-zero would mean the prefix ranking is noise (test bug), all-K
    would mean the audit can't distinguish widths (vacuous)."""
    from amplab_hive_spark.registry import all_queries

    rows = all_queries()["embedding_matryoshka_audit"].fn(spark, sf_dir).collect()
    assert rows, "audit must cover the query sample"
    overlaps = [r.n_overlap for r in rows]
    assert any(o > 0 for o in overlaps), "some neighborhood must survive truncation"
    assert any(o < 10 for o in overlaps), "truncation must lose something on isotropic data"
    assert all(abs(r.prefix_recall - r.n_overlap / 10.0) < 1e-9 for r in rows)


def test_epoch_mixture_plan_invariants(spark, sf_dir):
    """Every branch of the plan must fire on the fixture: the largest
    source pins the target (epochs=1, no fraction), at least one
    smaller source gets a nonzero fractional pass with a realized
    hash-gated subset, and planned_docs decomposes exactly."""
    from amplab_hive_spark.registry import all_queries

    rows = all_queries()["pipeline_epoch_mixture"].fn(spark, sf_dir).collect()
    assert len(rows) >= 2, "needs multiple sources to balance"
    target = max(r.total_chars for r in rows)
    anchor = [r for r in rows if r.total_chars == target]
    assert all(r.full_epochs == 1 and r.keep_millis == 0 for r in anchor)
    assert any(r.keep_millis > 0 and r.sampled_docs > 0 for r in rows), (
        "the fractional-epoch branch never fired — vacuous fixture"
    )
    for r in rows:
        assert r.planned_docs == r.full_epochs * r.n_docs + r.sampled_docs
        assert r.sampled_docs <= r.n_docs


def test_shard_manifest_invariants(spark, sf_dir):
    """Every shard respects the greedy-prefix budget rule: bytes
    BEFORE the last admitted item are under the boundary, shards are
    contiguous doc_id ranges per type, and the fixture actually
    produces multiple shards per type (non-vacuous)."""
    from amplab_hive_spark.llm.multimodal import _SHARD_BYTES
    from amplab_hive_spark.registry import all_queries

    rows = all_queries()["multimodal_shard_manifest"].fn(spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.media_type, []).append(r)
    assert len(by_type) == 3
    for mt, shards in by_type.items():
        shards.sort(key=lambda r: r.shard_id)
        assert len(shards) > 1, f"{mt}: single shard — vacuous budget"
        assert [s.shard_id for s in shards] == list(range(len(shards)))
        for prev, nxt in zip(shards, shards[1:]):
            assert prev.last_doc < nxt.first_doc, "shards must not interleave"
        # greedy-prefix: all but the last shard reach the boundary
        # (the next item would have started past it)
        cum = 0
        for s in shards[:-1]:
            cum += s.shard_bytes
            assert cum >= (s.shard_id + 1) * _SHARD_BYTES, (
                f"{mt} shard {s.shard_id} closed before its boundary"
            )


# --- round-7 additions: exact-substring dedup + bigram LM score -----
def test_exact_substring_catches_pasted_paragraph(spark, sf_dir):
    """The signal dedup_ngram_jaccard misses: a verbatim 12-token run
    pasted into an otherwise-different document must be reported by
    dedup_exact_substring with n_shared_windows = 12 - 8 + 1 = 5."""
    import amplab_hive_spark.llm.dedup as dmod
    from amplab_hive_spark.catalog import tables as real_tables

    para = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    rows = [
        (1, para + " unique tail one two three four five six seven eight"),
        (2, "totally different head nine ten eleven twelve " + para),
        (3, "no overlap here at all just filler words going on and on"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    class _T:
        documents = docs

    orig = dmod.tables
    dmod.tables = lambda *_a, **_k: _T()
    try:
        out = {
            (r.doc_a, r.doc_b): r.n_shared_windows
            for r in dmod.dedup_exact_substring(spark, sf_dir).collect()
        }
    finally:
        dmod.tables = orig
    assert out == {(1, 2): 5}, out


def test_bigram_lm_score_flags_shuffled_text(spark, sf_dir):
    """A document whose bigrams never occur elsewhere in the corpus
    must score lower than one built from corpus-frequent bigrams:
    the min score of a doc with a unique junction is the smallest
    possible (1e6 / context count)."""
    from amplab_hive_spark.registry import all_queries

    rows = all_queries()["text_bigram_lm_score"].fn(spark, sf_dir).collect()
    assert rows, "gate slice must be non-empty"
    for r in rows:
        assert 0 < r.lm_min <= r.lm_avg <= 1_000_000
        assert r.n_bigrams >= 1


def test_semantic_dedup_oracle_and_nonvacuous(spark):
    """dedup_semantic matches its end-to-end oracle (IVF build +
    within-cell pair search) at both gate SFs, and the threshold
    actually fires — some cell drops members (vacuity guard: the
    published SemDeDup epsilons would silently never fire on this
    near-isotropic fixture)."""
    from amplab_hive_spark.testing import compare

    spec = QUERIES["dedup_semantic"]
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        compare(spark, spec, sf)
        rows = spec.fn(spark, sf).collect()
        assert sum(r["n_dropped"] for r in rows) > 0, f"vacuous at {sf}"
        assert sum(r["n_members"] for r in rows) == sum(
            r["n_kept"] + r["n_dropped"] for r in rows)


def test_semantic_dedup_planted_duplicate_dropped(spark):
    """A planted exact duplicate (cos = 1) lands in the same cell as
    its original and the HIGHER vec_id is the one dropped (min-id
    survivor rule)."""
    import random

    from amplab_hive_spark.llm.dedup import semantic_dedup_stats

    def vec(seed):
        # deterministic 64-dim vector; distinct seeds are near-
        # orthogonal (|cos| well under the 0.95 threshold)
        rng = random.Random(seed)
        return [rng.uniform(-0.5, 0.5) for _ in range(64)]

    rows = [(i, vec(i)) for i in range(20)]
    rows.append((20, vec(7)))  # exact duplicate of vec_id 7
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    stats = semantic_dedup_stats(df, threshold=0.95).collect()
    assert sum(r["n_dropped"] for r in stats) == 1
    assert sum(r["n_kept"] for r in stats) == 20


def test_incremental_minhash_consistent_with_full_and_nonvacuous(spark, sf_dir):
    """Batch-vs-corpus near-dup pairs must be exactly the full
    minhash pair set restricted to pairs that CROSS the split
    (same signatures, same band scheme, same threshold — only the
    pairing scope differs; the corpus-side-only bucket cap can only
    ADD crossing pairs the full run's two-sided cap dropped, so the
    full set restricted to crossings must be a subset); and the gate
    fixture must actually produce pairs (vacuity guard)."""
    incr = {
        (r["batch_doc"], r["corpus_doc"])
        for r in QUERIES["dedup_incremental_minhash"].fn(spark, sf_dir).collect()
    }
    assert incr, "vacuous: no batch-vs-corpus near-dups on the fixture"
    full = QUERIES["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    crossing = set()
    for r in full:
        a, b = r["doc_a"], r["doc_b"]
        if (a % 10 == 0) != (b % 10 == 0):
            batch_doc, corpus_doc = (a, b) if a % 10 == 0 else (b, a)
            crossing.add((batch_doc, corpus_doc))
    assert crossing <= incr, f"missing pairs: {sorted(crossing - incr)[:5]}"
