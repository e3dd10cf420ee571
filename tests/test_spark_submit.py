"""Deployment-shape smoke: the north rule's run form is `spark-submit
--py-files dist/iees.zip jobs/run_pipeline.py` — this test executes that
EXACT command end-to-end on a small on-disk world and asserts the lake
comes out complete, and that a tampered (stale) zip is refused before any
Spark work starts."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None, reason="spark-submit not on PATH"
)


@pytest.fixture(scope="module")
def world_dir(tmp_path_factory):
    from incremental_entity_extraction_spark.config import DEFAULT_CONFIG as cfg
    from incremental_entity_extraction_spark.fixtures import make_world

    d = tmp_path_factory.mktemp("submit_world")
    w = make_world(cfg, n_convs=5, n_batches=2)
    w.transcripts.to_parquet(
        str(d / "transcripts.parquet"),
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )
    w.entities_kb.to_parquet(str(d / "kb.parquet"))
    return d


@pytest.fixture(scope="module")
def fresh_zip():
    sys.path.insert(0, ROOT)
    from tools.make_pyfiles_zip import ZIP_PATH, build

    build()
    yield ZIP_PATH
    build()  # leave it in sync however the tests mutated it


def _submit(world_dir, lake, extra=()):
    cmd = [
        SPARK_SUBMIT, "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", os.path.join(ROOT, "dist", "iees.zip"),
        os.path.join(ROOT, "jobs", "run_pipeline.py"),
        "--transcripts", str(world_dir / "transcripts.parquet"),
        "--kb", str(world_dir / "kb.parquet"),
        "--lake", str(lake), *extra,
    ]
    return subprocess.run(
        cmd, capture_output=True, text=True, cwd=ROOT, timeout=300
    )


def test_spark_submit_end_to_end(world_dir, fresh_zip, tmp_path):
    lake = tmp_path / "lake"
    res = _submit(world_dir, lake, extra=("--cluster-mode", "cc"))
    assert res.returncode == 0, res.stderr[-2000:]
    stats_line = [
        ln for ln in res.stdout.splitlines() if ln.startswith('{"completed_batches"')
    ]
    assert stats_line, res.stdout[-2000:]
    stats = json.loads(stats_line[-1])["completed_batches"]
    assert [s["batch_id"] for s in stats] == [0, 1]
    for table in ("mentions", "triples", "metrics", "prev_clusters"):
        assert (lake / table).exists(), table
    assert (lake / "lineage.jsonl").exists()


def test_spark_submit_refuses_stale_zip(world_dir, fresh_zip, tmp_path):
    with zipfile.ZipFile(fresh_zip, "a") as z:
        z.writestr("incremental_entity_extraction_spark/_stale_probe.py", "#")
    try:
        res = _submit(world_dir, tmp_path / "lake2")
        assert res.returncode != 0
        assert "STALE" in res.stderr + res.stdout
        assert not (tmp_path / "lake2").exists()  # refused before any work
    finally:
        from tools.make_pyfiles_zip import build

        build()
