"""Physical-plan regression guards for the scale-critical operators.

Each round's VERDICT audits `.explain("formatted")` by hand; these tests
pin the audited properties so a scale-killer (Cartesian product, global
single-partition exchange, unpushed filter, row-at-a-time Python UDF)
cannot silently reappear.  String-matching physical plans is blunt but
effective: the banned fragments are exact Spark operator names.
"""

import pytest
from pyspark.sql import functions as F

from incremental_entity_extraction_spark.config import DEFAULT_CONFIG as cfg


def plan_of(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


BANNED_EVERYWHERE = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",  # non-equi join — pair-space blowup at scale
    "BatchEvalPython",          # row-at-a-time Python UDF
)


def _assert_clean(plan: str, *, allow_single_partition: bool, label: str):
    for frag in BANNED_EVERYWHERE:
        assert frag not in plan, f"{label}: {frag} in physical plan"
    if not allow_single_partition:
        assert "Exchange SinglePartition" not in plan, (
            f"{label}: global single-partition exchange — serializes the "
            "table through one task"
        )


@pytest.fixture(scope="module")
def docs(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": range(200),
            "text": [f"zorvex marnel doc {i} the a of" for i in range(200)],
            "source": ["web" if i % 2 else "chat" for i in range(200)],
        }
    )
    return spark.createDataFrame(pdf)


@pytest.fixture(scope="module")
def embs(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "emb_id": range(300),
            "embedding": [
                [float(x) for x in rng.normal(size=16)] for _ in range(300)
            ],
        }
    )
    return spark.createDataFrame(pdf)


def test_fused_stage_is_narrow(spark, spark_world):
    """detect→encode→retrieve adds NO exchange: one Arrow pass over the
    scan, scoring against the broadcast — the whole point of the topology."""
    from incremental_entity_extraction_spark.operators.fused import (
        detect_encode_retrieve,
    )
    from incremental_entity_extraction_spark.operators.retrieval import (
        build_kb_shards,
    )

    shards = build_kb_shards(spark_world["entities_kb"], 1)
    df = detect_encode_retrieve(spark_world["transcripts"], cfg, shards)
    plan = plan_of(df)
    _assert_clean(plan, allow_single_partition=False, label="fused")
    assert "Exchange" not in plan, "fused stage must not shuffle"
    # the fused stage is a single Arrow-native Python pass
    assert "MapInArrow" in plan or "MapInPandas" in plan


def test_topk_per_key_uses_window_group_limit(spark, spark_world):
    """Per-key top-k must push the limit below the shuffle (WindowGroupLimit)
    and never collapse to one partition."""
    from incremental_entity_extraction_spark.operators.fused import (
        detect_encode_retrieve,
    )
    from incremental_entity_extraction_spark.operators.retrieval import (
        build_kb_shards,
    )
    from pyspark.sql import Window

    shards = build_kb_shards(spark_world["entities_kb"], 1)
    m = detect_encode_retrieve(spark_world["transcripts"], cfg, shards)
    c = m.select("mention_id", F.explode("candidates").alias("c"))
    w = Window.partitionBy("mention_id").orderBy(F.desc("c.score"))
    top = c.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= 3)
    plan = plan_of(top)
    _assert_clean(plan, allow_single_partition=False, label="topk_per_key")
    assert "WindowGroupLimit" in plan


def test_ngram_jaccard_no_cartesian(spark, docs):
    from incremental_entity_extraction_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text", n=3,
                                threshold=0.5)
    plan = plan_of(pairs)
    _assert_clean(plan, allow_single_partition=False, label="ngram_jaccard")
    # the inverted-index self-join must be an EQUI-join (hash or sort-merge —
    # Catalyst may broadcast the small side at test scale; both are fine)
    assert any(
        j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_exact_dedup_single_shuffle(spark, docs):
    from incremental_entity_extraction_spark.operators.dedup import (
        exact_duplicates,
    )

    groups = exact_duplicates(docs, id_col="doc_id", text_col="text")
    plan = plan_of(groups)
    _assert_clean(plan, allow_single_partition=False, label="dedup_exact")
    # one hash exchange on the content hash, nothing else
    assert plan.count("Exchange hashpartitioning") <= 2


def test_ivf_topk_is_cogrouped(spark, embs):
    from incremental_entity_extraction_spark.operators.similarity_search import (
        ivf_topk,
    )

    q = embs.withColumnRenamed("emb_id", "vec_id").limit(20)
    c = embs.withColumnRenamed("emb_id", "vec_id")
    nn = ivf_topk(q, c, k=5, n_centroids=8, n_probe=2)
    plan = plan_of(nn)
    _assert_clean(plan, allow_single_partition=False, label="ivf_topk")
    assert "FlatMapCoGroupsInPandas" in plan
    assert "WindowGroupLimit" in plan  # global top-k bounded below the window


def test_contiguous_ids_no_global_window(spark, docs):
    from incremental_entity_extraction_spark.operators.kb import contiguous_ids

    out = contiguous_ids(docs.select("text"), ["text"], id_col="id")
    plan = plan_of(out)
    _assert_clean(plan, allow_single_partition=False, label="contiguous_ids")


def test_parquet_filter_pushdown(spark, tmp_path):
    """Filters and projections must reach the parquet scan."""
    import pandas as pd

    p = str(tmp_path / "t.parquet")
    pd.DataFrame(
        {"a": range(100), "b": range(100), "c": [str(i) for i in range(100)]}
    ).to_parquet(p)
    df = spark.read.parquet(p).filter(F.col("a") > 50).select("a", "c")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(a), GreaterThan(a,50)]" in plan
    assert "ReadSchema" in plan and "b:" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_ivf_pq_plan_is_bucket_parallel(spark, spark_world):
    """The PQ engine's plan must have the same shape as ivf_topk's: Arrow
    Python stages + cogroup on bucket + window top-k — no Cartesian
    product, no nested-loop join, no row-at-a-time Python; the exact
    re-rank joins the (broadcast) shortlist, never the corpus crossed with
    queries."""
    import pandas as pd

    from incremental_entity_extraction_spark.operators.similarity_search import (
        ivf_pq_topk,
    )

    rng = __import__("numpy").random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "vec_id": range(300),
            "embedding": [
                [float(x) for x in rng.normal(size=16)] for _ in range(300)
            ],
        }
    )
    corpus = spark.createDataFrame(pdf)
    q = corpus.filter(F.col("vec_id") < 20)
    df = ivf_pq_topk(q, corpus, k=5, n_centroids=8, n_probe=4, m_subvectors=4)
    plan = plan_of(df)
    _assert_clean(plan, allow_single_partition=False, label="ivf_pq")
    assert "FlatMapCoGroupsInPandas" in plan or "CoGroup" in plan
    assert "BroadcastHashJoin" in plan  # shortlist re-rank join, broadcast


def test_ann_index_search_plan(spark, embs, tmp_path):
    """The persisted-index search must scan the rows table with bucket
    partition filters (pruned listing), keep Python vectorized
    (MapInPandas, no BatchEvalPython), and bound the global top-k below
    the window — and the pq re-rank must join the broadcast shortlist,
    never cross queries with the corpus."""
    from incremental_entity_extraction_spark.operators.ann_index import (
        ann_index_search,
        build_ann_index,
    )

    c = embs.withColumnRenamed("emb_id", "vec_id")
    q = c.limit(20)
    model = build_ann_index(c, str(tmp_path / "idx"), mode="ivf",
                            n_centroids=8, seed=11)
    nn = ann_index_search(model, spark, q, k=5, exclude_self=True)
    plan = plan_of(nn)
    _assert_clean(plan, allow_single_partition=False, label="ann_index_search")
    assert "MapInPandas" in plan
    assert "WindowGroupLimit" in plan
    # the bucket/added_batch filters land on the parquet source as
    # partition filters (pruned file listing, not a post-scan filter)
    assert "PartitionFilters" in plan and "bucket" in plan.split(
        "PartitionFilters"
    )[1][:400]

    pq_model = build_ann_index(c, str(tmp_path / "pq_idx"), mode="ivf_pq",
                               n_centroids=8, seed=11)
    nn_pq = ann_index_search(
        pq_model, spark, q, k=5, rerank=32, rerank_corpus=c,
        exclude_self=True,
    )
    plan_pq = plan_of(nn_pq)
    _assert_clean(plan_pq, allow_single_partition=False,
                  label="ann_index_search_pq")
    assert "BroadcastHashJoin" in plan_pq  # shortlist re-rank join

    nn_cg = ann_index_search(
        model, spark, q, k=5, exclude_self=True, query_mode="cogroup"
    )
    plan_cg = plan_of(nn_cg)
    _assert_clean(plan_cg, allow_single_partition=False,
                  label="ann_index_search_cogroup")
    assert "FlatMapCoGroupsInPandas" in plan_cg


def test_manifest_read_partition_prunes(spark, tmp_path):
    """A manifest-resolved read (explicit file list + basePath) must still
    PARTITION-PRUNE: at 100 TB the manifest names every live file, and a
    batch_id filter that scanned all partitions anyway would turn every
    incremental query into a full-table scan."""
    from incremental_entity_extraction_spark.operators import manifest as mf

    root = str(tmp_path / "tbl")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    for b in (0, 1, 2):
        spark.range(10).select(
            F.col("id"), F.lit(b).alias("batch_id")
        ).write.mode("overwrite").partitionBy("batch_id").parquet(root)
    mf.refresh_manifest(root)
    df = mf.read_table(spark, root).filter(F.col("batch_id") == 1)
    plan = plan_of(df)
    assert "PartitionFilters" in plan and "batch_id" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    _assert_clean(plan, allow_single_partition=True, label="manifest read")
    # (inputFiles() reports the PRE-pruning file index, so the
    # PartitionFilters assertion above is the right layer to pin)
    assert df.count() == 10


def test_q51_filter_pushes_to_scan(spark):
    """The rerank-dump head filter (rr_pos = 0) must reach the parquet
    scan as a pushed filter — the dump is mention×k rows, and reading all
    positions to keep one is a k-fold overscan at any corpus size."""
    from incremental_entity_extraction_spark.entry_queries import (
        q51_rerank_order_twin,
    )

    df = q51_rerank_order_twin(spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    pushed = plan.split("PushedFilters")[1].split("]")[0] if "PushedFilters" in plan else ""
    assert "rr_pos" in pushed, plan
    _assert_clean(plan, allow_single_partition=True, label="q51")
