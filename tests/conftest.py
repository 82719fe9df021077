from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastmlframework_spark.core.session import get_spark

SF_DIR = os.environ.get(
    "FASTML_TEST_SF_DIR",
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
)
SF_DIR_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # local[8]/8 (was local[32]/32): at sf0.001-0.01 test data nothing
    # parallelizes past 8 cores and several paths anti-scale (the r13
    # driver's own 8-core run of the full bench beat its 32-core run;
    # every PERF_r13 scaling ratio was <= 1.17) - the suite is
    # scheduling-bound, so fewer tasks per stage is pure wall-clock.
    # Overridable for a full-width run: FASTML_TEST_CPUS=32 pytest ...
    cpus = int(os.environ.get("FASTML_TEST_CPUS", "8"))
    s = get_spark(
        app_name="fastml-tests",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def sf_dir_small():
    return SF_DIR_SMALL
