"""Verify-skill drive: parity vs oracle, resume, entry contract.

Run: python tools/verify_drive.py
"""
import shutil

from incremental_entity_extraction_spark.session import get_spark
from incremental_entity_extraction_spark.fixtures import make_world
from incremental_entity_extraction_spark.oracle import oracle_run_incremental
from incremental_entity_extraction_spark.config import DEFAULT_CONFIG as cfg
from incremental_entity_extraction_spark.pipeline import Lake, run_incremental


def triple_set(pdf):
    return set(map(tuple, pdf[["subj", "pred", "obj"]].itertuples(index=False)))


def main():
    spark = get_spark(cores=8)
    w = make_world(n_convs=12)
    om, oc, ot, _ = oracle_run_incremental(w.transcripts, w.entities_kb, cfg)
    oset = triple_set(ot)

    # 1. parity (greedy_replay)
    shutil.rmtree("/tmp/vlake", ignore_errors=True)
    lake = Lake("/tmp/vlake")
    tdf = spark.createDataFrame(w.transcripts)
    kdf = spark.createDataFrame(w.entities_kb)
    run_incremental(spark, tdf, kdf, lake, cfg, cluster_mode="greedy_replay")
    sset = triple_set(spark.read.parquet(lake.path("triples")).toPandas())
    p = len(sset & oset) / max(len(sset), 1)
    r = len(sset & oset) / max(len(oset), 1)
    print(f"parity greedy_replay: P={p:.3f} R={r:.3f} n={len(sset)}")
    assert p == 1.0 and r == 1.0, "parity failed"

    # 2. resume: prefix run then full run on same lake == full-run triples
    shutil.rmtree("/tmp/vlake2", ignore_errors=True)
    lake2 = Lake("/tmp/vlake2")
    run_incremental(
        spark, tdf.filter("batch_id<=1"), kdf, lake2, cfg,
        cluster_mode="greedy_replay",
    )
    done_before = sorted(lake2.completed_batches())
    run_incremental(spark, tdf, kdf, lake2, cfg, cluster_mode="greedy_replay")
    s2 = triple_set(spark.read.parquet(lake2.path("triples")).toPandas())
    print(f"resume: prefix batches={done_before} final equal={s2 == sset}")
    assert s2 == sset, "resume mismatch"

    # 3. ANN-mode drive (this round touched the run_batch ANN branch):
    # ivf retrieval with a persisted index, parity is cc>=0.95 on small worlds
    shutil.rmtree("/tmp/vlake3", ignore_errors=True)
    lake3 = Lake("/tmp/vlake3")
    run_incremental(
        spark, tdf, kdf, lake3, cfg, cluster_mode="cc", retrieval_mode="ivf",
    )
    s3 = triple_set(spark.read.parquet(lake3.path("triples")).toPandas())
    p3 = len(s3 & oset) / max(len(s3), 1)
    r3 = len(s3 & oset) / max(len(oset), 1)
    print(f"parity cc+ivf-index: P={p3:.3f} R={r3:.3f}")
    assert p3 >= 0.95 and r3 >= 0.95, "ann parity below bar"

    # 4. entry contract spot-check vs duckdb oracle
    import duckdb

    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    df = e.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, schema ok")
    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    for qname in ("q02_group_agg_stats", "q22_cosine_topk"):
        spdf = qs[qname](spark, sf).toPandas()
        opdf = con.execute(osql[qname]).df()
        cols = sorted(spdf.columns)
        a = spdf[cols].round(6).sort_values(cols).reset_index(drop=True)
        b = opdf[cols].round(6).sort_values(cols).reset_index(drop=True)
        ok = a.shape == b.shape and (a.values == b.values).all()
        print(f"entry {qname}: rows={len(a)} match={ok}")
        assert ok, f"{qname} mismatch"
    print("VERIFY DRIVE: ALL GREEN")


if __name__ == "__main__":
    main()
