"""Per-SparkContext Column-expression memo (functions/expr_cache.py):
builder runs once per (context, key), distinct keys build separately,
unhashable keys fall back to uncached, and the cached templates produce
plans identical to freshly-built ones (value parity rides the existing
pipeline/NIL oracle tests — predict_nil & co. now route through the
cache unconditionally)."""

from pyspark.sql import functions as F

from incremental_entity_extraction_spark.functions.expr_cache import (
    cached_exprs,
)


def test_builder_runs_once_per_key(spark):
    sc = spark.sparkContext
    calls = []

    def build():
        calls.append(1)
        return [F.lit(1).alias("one")]

    a = cached_exprs(sc, ("t1", 42), build)
    b = cached_exprs(sc, ("t1", 42), build)
    assert a is b and len(calls) == 1
    c = cached_exprs(sc, ("t1", 43), build)
    assert c is not a and len(calls) == 2


def test_unhashable_key_falls_back_uncached(spark):
    sc = spark.sparkContext
    calls = []

    def build():
        calls.append(1)
        return [F.lit(2).alias("two")]

    cached_exprs(sc, ("t2", [1, 2]), build)
    cached_exprs(sc, ("t2", [1, 2]), build)
    assert len(calls) == 2  # list key is unhashable -> built each time


def test_cached_templates_match_fresh_plan(spark, cfg):
    from incremental_entity_extraction_spark.operators.nil import (
        _nil_select_cols,
        predict_nil,
    )

    df = spark.createDataFrame(
        [
            ("m1", [(1, 0, 10, "a", 9.0, 0.9), (2, 0, 11, "b", 5.0, 0.5)]),
            ("m2", []),
        ],
        "mention_id string, candidates array<struct<id:long,indexer:int,"
        "wikipedia_id:long,title:string,score:double,norm_score:double>>",
    )
    via_cache = predict_nil(df, cfg)
    fresh = df.select("*", *_nil_select_cols(cfg))
    assert via_cache.schema == fresh.schema
    rows_c = sorted(map(tuple, via_cache.collect()))
    rows_f = sorted(map(tuple, fresh.collect()))
    assert rows_c == rows_f
    # second call reuses the same plan shape and values
    again = predict_nil(df, cfg)
    assert sorted(map(tuple, again.collect())) == rows_c


def test_cached_aliases_safe_across_two_frames_joined(spark, cfg):
    """Cached aliased Columns carry construction-time exprIds reused in
    every plan; joining two outputs of the same cached-expr operator must
    still resolve per-side (Spark's DeduplicateRelations re-aliases
    conflicting ids).  Empirically verified safe on Spark 4.1 — this test
    pins it so an engine upgrade that breaks it is caught here, not in a
    user's composition."""
    from incremental_entity_extraction_spark.operators.nil import predict_nil

    schema = (
        "mention_id string, candidates array<struct<id:long,indexer:int,"
        "wikipedia_id:long,title:string,score:double,norm_score:double>>"
    )
    df1 = spark.createDataFrame(
        [("m1", [(1, 0, 10, "a", 9.0, 0.9)]), ("m2", [])], schema
    )
    df2 = spark.createDataFrame(
        [("m1", [(2, 0, 11, "b", 5.0, 0.5)]), ("m2", [])], schema
    )
    a = predict_nil(df1, cfg)
    b = predict_nil(df2, cfg)
    j = a.join(b, "mention_id").select(
        a["nil_score"].alias("s1"), b["nil_score"].alias("s2")
    )
    rows = {r["s1"] != r["s2"] for r in j.collect()}
    # m1's sides differ (different candidates) -> per-side binding worked
    assert True in rows
