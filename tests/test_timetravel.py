"""operators/timetravel.py: version-log commit protocol, AS-OF reads,
crash-safety of the publish point, and vacuum retention."""

from __future__ import annotations

import json
import os

import pytest

from free_etl_spark.operators.timetravel import (
    commit_version,
    files_as_of,
    latest_version,
    read_version,
    vacuum,
)


def _ids(spark, table, v=None):
    return sorted(
        r.id for r in read_version(spark, str(table), v).select("id").collect()
    )


def test_append_overwrite_asof(spark, tmp_path):
    t = tmp_path / "tbl"
    assert latest_version(str(t)) == 0
    v1 = commit_version(spark, str(t), spark.range(0, 3), "overwrite")
    v2 = commit_version(spark, str(t), spark.range(10, 12), "append")
    v3 = commit_version(spark, str(t), spark.range(100, 101), "overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert _ids(spark, t, 1) == [0, 1, 2]
    assert _ids(spark, t, 2) == [0, 1, 2, 10, 11]  # append sees v1
    assert _ids(spark, t, 3) == [100]  # overwrite resets
    assert _ids(spark, t) == [100]  # default = latest
    assert latest_version(str(t)) == 3


def test_unpublished_data_is_invisible(spark, tmp_path):
    """Crash between data write and log publish: the orphan directory
    must not appear in any read (write-then-publish protocol)."""
    t = tmp_path / "tbl"
    commit_version(spark, str(t), spark.range(0, 2), "overwrite")
    # simulate the crash: data for v2 lands, log entry never written
    spark.range(50, 60).write.parquet(str(t / "v2"))
    assert _ids(spark, t) == [0, 1]
    assert latest_version(str(t)) == 1
    # recovery: the next commit sweeps the never-published orphan
    # (invisible by the protocol, so removal is safe) instead of
    # colliding with it forever; none of the orphan's rows leak into
    # the committed version
    v = commit_version(spark, str(t), spark.range(7, 8), "append")
    assert v == 2
    assert _ids(spark, t) == [0, 1, 7]


def test_vacuum_retention(spark, tmp_path):
    t = tmp_path / "tbl"
    commit_version(spark, str(t), spark.range(0, 2), "overwrite")
    commit_version(spark, str(t), spark.range(10, 12), "append")
    commit_version(spark, str(t), spark.range(100, 102), "overwrite")
    commit_version(spark, str(t), spark.range(200, 202), "append")
    removed = vacuum(str(t), keep_from_version=3)
    assert removed  # v1+v2 files gone
    # survivors intact, history before the overwrite is gone
    assert _ids(spark, t, 3) == [100, 101]
    assert _ids(spark, t) == [100, 101, 200, 201]
    with pytest.raises(ValueError):
        read_version(spark, str(t), 1)
    logs = sorted(os.listdir(t / "_log"))
    assert [json.load(open(t / "_log" / f))["version"] for f in logs] == [3, 4]


def test_vacuum_refuses_to_strand_appends(spark, tmp_path):
    """keep_from pointing AT an append must widen back to the prior
    overwrite (the append's visible set includes older files)."""
    t = tmp_path / "tbl"
    commit_version(spark, str(t), spark.range(0, 2), "overwrite")
    commit_version(spark, str(t), spark.range(10, 12), "append")
    vacuum(str(t), keep_from_version=2)  # widens to 1 -> no-op
    assert _ids(spark, t, 2) == [0, 1, 10, 11]
