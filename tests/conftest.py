from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beholder_spark.fixtures import write_fixtures  # noqa: E402
from beholder_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("beholder-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("fixtures"))
    write_fixtures(out, n_pages=2000, n_loglines=1500)
    return out


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
