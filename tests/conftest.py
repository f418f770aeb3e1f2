from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def finish(q, timeout: int = 1200) -> None:
    """Block until the streaming query ``q`` terminates, asserting it did.

    ``StreamingQuery.awaitTermination(t)`` returns ``False`` (without raising)
    when the query is still running after ``t`` seconds; ignoring that return
    lets a loaded host produce torn mid-stream reads of the sink.  Every test
    must use this helper instead of a bare ``awaitTermination`` call.

    The generous default exists for loaded hosts: under three concurrent
    full-registry sweeps a ~10 s availableNow replay was measured blowing
    through 600 s; on a healthy run queries finish in seconds, so the only
    cost of headroom is slower detection of a genuinely hung stream.
    """
    done = q.awaitTermination(timeout)
    if not done:
        try:
            q.stop()
        except Exception:
            pass  # the timeout AssertionError is the diagnostic that matters
        raise AssertionError(
            f"stream did not finish within {timeout}s (query {q.name or q.id})"
        )


@pytest.fixture(scope="session")
def spark():
    from real_time_data_anomaly_detection_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
