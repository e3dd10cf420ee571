"""contiguous_ids: the two-level rank (range partition + per-partition
row_number + offsets) must equal a global rank for any input distribution,
partition count, and start offset."""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from incremental_entity_extraction_spark.operators.kb import contiguous_ids


@pytest.mark.parametrize("n,parts,start", [(1, 1, 0), (100, 7, 1), (5000, 16, 1000)])
def test_ids_equal_global_rank(spark, n, parts, start):
    rng = random.Random(42 + n)
    # skewed key population: many shared prefixes, distinct suffixes
    keys = sorted({f"{rng.choice('abc')}{rng.randrange(10)}_{i:06d}" for i in range(n)})
    rng.shuffle(keys)
    df = spark.createDataFrame(pd.DataFrame({"k": keys})).repartition(5)
    out = contiguous_ids(df, ["k"], id_col="id", start=start, num_partitions=parts)
    got = out.toPandas().sort_values("k").reset_index(drop=True)
    want_ids = list(range(start, start + len(keys)))
    assert list(got["id"]) == want_ids
    # and the id order is exactly the key order
    assert list(got["k"]) == sorted(keys)


def test_empty_input(spark):
    df = spark.createDataFrame([], "k string")
    out = contiguous_ids(df, ["k"]).toPandas()
    assert len(out) == 0
    assert "id" in out.columns


def test_composite_order_cols(spark):
    pdf = pd.DataFrame(
        {"a": ["x", "x", "y", "y", "z"], "b": [2, 1, 9, 0, 5]}
    )
    out = (
        contiguous_ids(spark.createDataFrame(pdf), ["a", "b"], start=0,
                       num_partitions=3)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(zip(out["a"], out["b"])) == sorted(zip(pdf["a"], pdf["b"]))
    assert list(out["id"]) == [0, 1, 2, 3, 4]
