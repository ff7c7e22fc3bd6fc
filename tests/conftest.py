import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ictspark import synth
from ictspark.session import get_spark

SF_SMOKE = "sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cpus=4, shuffle_partitions=8, app="ictspark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def smoke_dir() -> str:
    return synth.ensure(SF_SMOKE)


@pytest.fixture(scope="session")
def smoke_sf_dir() -> str:
    """Driver-style sf dir whose basename maps to the smoke synth data."""
    return "/root/testdata/sf0.001"
