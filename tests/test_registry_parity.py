"""Every registry query hash-matches its DuckDB oracle at sf0.001 —
the same comparison the driver runs at sf0.01 (tools/parity.py)."""

from __future__ import annotations

import pytest

from stockpulse_spark.plans import REGISTRY
from tests.conftest import SF_DIR
from tools.parity import compare, duck_con


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(name, spark, con):
    status, _, nrows, _, _ = compare(name, spark, con, SF_DIR, verbose=False)
    if status == "NO_ORACLE":
        assert nrows >= 0  # weaker rows-only check, mirrors the driver
        return
    assert status == "OK", status
