"""SQL-surface parity: ANSI-portable oracle strings must run verbatim
through spark.sql (same Catalyst pipeline as the DataFrame API) and
produce the same result as the registered DataFrame query."""

from __future__ import annotations

import pandas as pd
import pytest

import __spark_entry__ as entrymod
from free_etl_spark.sqlrun import run_sql
from tests.conftest import SF_DIR

# oracles that are pure ANSI (no DuckDB list lambdas / generate_series)
_PORTABLE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q12_priority_shipping",
    "tpch_q14_promo_revenue",
    "join_semi",
    "join_anti",
    "set_union",
    "set_intersect_all",
    "udf_grouped_agg_weighted",
]


@pytest.mark.parametrize("name", _PORTABLE)
def test_oracle_sql_runs_on_spark_and_matches_dataframe(spark, name):
    sql = entrymod.oracle_sql()[name]
    df_result = entrymod.queries()[name](spark, SF_DIR).toPandas()
    sql_result = run_sql(spark, SF_DIR, sql).toPandas()
    a = df_result[sorted(df_result.columns)].sort_values(
        by=sorted(df_result.columns), ignore_index=True
    )
    b = sql_result[sorted(sql_result.columns)].sort_values(
        by=sorted(sql_result.columns), ignore_index=True
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_run_sql_reregisters_on_sf_dir_switch(spark):
    """A→B→A must re-register A's views (temp views are session-global;
    caching visited pairs would leave B's tables bound on the 3rd call)."""
    a = run_sql(spark, "/root/testdata/sf0.001", "SELECT count(*) AS n FROM region").collect()[0]["n"]
    run_sql(spark, "/root/testdata/sf0.01", "SELECT count(*) AS n FROM orders").collect()
    n_orders_a = run_sql(
        spark, "/root/testdata/sf0.001", "SELECT count(*) AS n FROM orders"
    ).collect()[0]["n"]
    n_orders_b = run_sql(
        spark, "/root/testdata/sf0.01", "SELECT count(*) AS n FROM orders"
    ).collect()[0]["n"]
    assert a == 5
    assert n_orders_a != n_orders_b  # third call really sees sf0.001 again
