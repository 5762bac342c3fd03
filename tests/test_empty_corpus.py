"""Empty-corpus robustness sweep: EVERY registered query must either
produce a (possibly empty) result or raise a DOCUMENTED ValueError
contract on zero-row tables — never an undocumented engine exception
(the sweep caught q232/q233 failing ANALYSIS with an untyped
array_min(array()) before their empty-centroid guards existed)."""

from __future__ import annotations

import os

import pytest

from file_appender_spark.queries import QUERIES
from file_appender_spark.sources.catalog import TABLES, load_table

# queries whose docstrings declare a raise-on-degenerate-input
# contract: q146 (selection exhaustion raises), q158 (PQ needs >= 16
# seed vectors), q163 (corpus-derived token_df_cap must be >= 1)
VALUEERROR_CONTRACT = {
    "q146_exact_selection",
    "q158_pq_encode",
    "q163_wjaccard_capped",
}


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_empty"))
    for t in TABLES:
        load_table(spark, sf_dir, t).limit(0).write.mode("overwrite").parquet(
            os.path.join(d, f"{t}.parquet")
        )
    return d


def test_every_query_survives_empty_tables(spark, empty_dir):
    undocumented = []
    for name, spec in QUERIES.items():
        try:
            n = spec.spark_fn(spark, empty_dir).count()
            assert n >= 0
        except ValueError:
            if name not in VALUEERROR_CONTRACT:
                undocumented.append((name, "ValueError"))
        except Exception as e:  # noqa: BLE001 — the sweep's whole point
            undocumented.append((name, type(e).__name__))
    assert not undocumented, undocumented
