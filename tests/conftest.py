"""Shared fixtures: one Spark session, one deterministic world, oracle runs."""

from __future__ import annotations

import shutil

import pytest

from incremental_entity_extraction_spark.config import DEFAULT_CONFIG
from incremental_entity_extraction_spark.fixtures import make_world
from incremental_entity_extraction_spark.oracle import oracle_run_incremental
from incremental_entity_extraction_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=4, app_name="iee-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg():
    return DEFAULT_CONFIG


@pytest.fixture(scope="session")
def world(cfg):
    return make_world(cfg, n_convs=10)


@pytest.fixture(scope="session")
def oracle_result(world, cfg):
    """(mentions, clusters, triples, state) from the NumPy oracle."""
    return oracle_run_incremental(world.transcripts, world.entities_kb, cfg)


@pytest.fixture(scope="session")
def spark_world(spark, world):
    """world tables as Spark DataFrames."""
    return {
        "transcripts": spark.createDataFrame(world.transcripts),
        "entities_kb": spark.createDataFrame(world.entities_kb),
    }


@pytest.fixture()
def tmp_lake(tmp_path):
    from incremental_entity_extraction_spark.pipeline import Lake

    p = str(tmp_path / "lake")
    shutil.rmtree(p, ignore_errors=True)
    return Lake(p)
