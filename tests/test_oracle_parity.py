"""Every registered query must match its DuckDB oracle at sf0.001.

This is the same comparison the driver runs at sf0.01 (row count +
column-name schema + order-insensitive value multiset).
"""

from __future__ import annotations

import pytest

from real_time_data_anomaly_detection_spark.operators import REGISTRY
from tests.conftest import SF_DIR
from tools.verify_oracle import rows_multiset

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, duck):
    q = REGISTRY[name]
    sdf = q.spark_fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"schema mismatch: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
    assert rows_multiset(scols, srows) == rows_multiset(dcols, drows)
