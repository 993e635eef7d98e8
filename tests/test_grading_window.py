"""Grading-window hygiene (round-2 verdict task 10): the driver
grades the FIRST 50 registry entries; every one of those slots must
carry a full DuckDB oracle so a future registration can't silently
displace a three-check-green row with a rows-only one.
"""

from amplab_hive_spark.registry import _PRIORITY, all_queries

WINDOW = 50


def test_priority_covers_window():
    assert len(_PRIORITY) >= WINDOW, (
        f"curated priority list shrank below the driver's {WINDOW}-entry window"
    )


def test_first_window_entries_all_oracled():
    specs = all_queries()
    window = list(specs)[:WINDOW]
    missing = [n for n in window if specs[n].oracle is None]
    assert not missing, (
        f"graded-window entries without a DuckDB oracle (would drop to the "
        f"rows-only check): {missing}"
    )


def test_window_matches_curated_order():
    specs = all_queries()
    assert list(specs)[: len(_PRIORITY)] == list(_PRIORITY)


def test_window_outputs_are_atomic_types(spark, sf_dir):
    """Round-4 lesson: the driver's oracle canonicalizer sorts/hashes
    pandas cells, and a list/map/struct cell kills the compare
    infrastructure itself (`embedding_quantize_int8` went harness-red
    with `TypeError: unhashable type: 'list'` — not a wrong answer, an
    unverifiable one). Pin the contract mechanically: every graded
    query's output schema must contain only atomic fields, so a future
    window swap can't reintroduce the failure class. Schema inspection
    is lazy — no query executes here.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    specs = all_queries()
    offenders = []
    for name in list(specs)[:WINDOW]:
        df = specs[name].fn(spark, sf_dir)
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not offenders, (
        "graded-window queries emitting non-atomic columns (the driver's "
        f"canonicalizer cannot sort/hash these cells): {offenders}"
    )
