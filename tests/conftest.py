from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from engine.session import get_spark

    s = get_spark("engine-tests", cores=8, shuffle_partitions=16)
    yield s
