from __future__ import annotations

import pytest

from kg.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kg-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    import os

    return os.environ.get("KG_TEST_SF_DIR", "/root/testdata/sf0.001")
