from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from free_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("free-etl-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def make_xlsx_bytes(df):
    """xlsx fixture bytes: openpyxl writer when installed (the exact
    artifact a real upload produces), xlsx_lite's stdlib writer
    otherwise — so XLSX intake tests run in both environments."""
    import io

    try:
        import openpyxl  # noqa: F401

        buf = io.BytesIO()
        df.to_excel(buf, index=False, engine="openpyxl")
        return buf.getvalue()
    except ImportError:
        from free_etl_spark.intake.xlsx_lite import write_xlsx

        return write_xlsx(df)


def has_openpyxl() -> bool:
    try:
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        return False
