from __future__ import annotations

import pytest

from aggo_spark import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="aggo-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


def rows(df):
    """Collect to list-of-dicts sorted for order-insensitive comparison."""
    out = [r.asDict(recursive=True) for r in df.collect()]
    return sorted(out, key=lambda d: str(sorted(d.items(), key=lambda kv: kv[0])))
