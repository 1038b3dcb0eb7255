"""Differential-oracle parity for every registered query (mirrors the
grading driver: row count + schema + order-insensitive values, but
STRICT/bit-exact). Auto-covers each new operator as it registers."""

import pytest

from big_data_analysis_spark.parity import compare_query
from big_data_analysis_spark.registry import load_all

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    report = compare_query(spark, duck, spec, sf_dir)
    assert report.ok, f"{report.detail}; mismatches={report.mismatches[:2]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_contract_shapes():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())
