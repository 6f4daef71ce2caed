from __future__ import annotations

import pytest

import pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark as pl

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = pl.get_spark(app_name="pulselake-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tables(spark):
    return pl.load_tables(spark, SF_SMALL)
