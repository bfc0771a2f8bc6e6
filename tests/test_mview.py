"""Incremental materialized aggregates (pipelines/mview.py): refresh from
CDC equals full recompute; non-append history is rejected."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from parquet_go_ray.pipelines import table as T
from parquet_go_ray.pipelines.mview import refresh_group_agg

AGGS = [
    ("s", "sum", "v"),
    ("n", "count", None),
    ("lo", "min", "v"),
    ("hi", "max", "v"),
]


def _mk(n0, n1, mod=7):
    idx = np.arange(n0, n1)
    return pa.table(
        {
            "g": pa.array([f"g{i % mod}" for i in idx]),
            "v": pa.array((idx * 13) % 1000, pa.int64()),
            "k": pa.array(idx, pa.int64()),
        }
    )


def _sorted(t: pa.Table) -> pa.Table:
    return t.sort_by("g")


def test_incremental_equals_full(ray_session, tmp_path):
    d = str(tmp_path / "t")
    T.table_write(rd.from_arrow(_mk(0, 3000)).repartition(3), d)
    state = refresh_group_agg(d, ["g"], AGGS)
    assert state["version"] == 1 and state["data"].num_rows == 7
    T.table_write(rd.from_arrow(_mk(3000, 5000)).repartition(2), d)
    T.table_write(rd.from_arrow(_mk(5000, 5100)), d)
    state = refresh_group_agg(d, ["g"], AGGS, state=state)
    assert state["version"] == 3
    full = refresh_group_agg(d, ["g"], AGGS)
    assert _sorted(state["data"]).equals(_sorted(full["data"]))
    # hand-check one group against numpy
    idx = np.arange(5100)
    v = (idx * 13) % 1000
    m = idx % 7 == 0
    row = {
        r["g"]: r for r in state["data"].to_pylist()
    }["g0"]
    assert row["s"] == int(v[m].sum())
    assert row["n"] == int(m.sum())
    assert row["lo"] == int(v[m].min()) and row["hi"] == int(v[m].max())


def test_refresh_is_idempotent_and_versioned(ray_session, tmp_path):
    d = str(tmp_path / "t")
    T.table_write(rd.from_arrow(_mk(0, 500)), d)
    s1 = refresh_group_agg(d, ["g"], AGGS)
    assert refresh_group_agg(d, ["g"], AGGS, state=s1) is s1  # head unchanged
    T.table_write(rd.from_arrow(_mk(500, 600)), d)
    # to_version pins the fold point
    s_mid = refresh_group_agg(d, ["g"], AGGS, to_version=1)
    assert _sorted(s_mid["data"]).equals(_sorted(s1["data"]))


def test_non_append_history_rejected(ray_session, tmp_path):
    d = str(tmp_path / "t")
    T.table_write(rd.from_arrow(_mk(0, 1000)).repartition(2), d)
    state = refresh_group_agg(d, ["g"], AGGS)
    T.table_delete(d, ("v", "<", 100), mode="equality")
    with pytest.raises(ValueError, match="not append-only"):
        refresh_group_agg(d, ["g"], AGGS, state=state)
    # from-scratch recompute reflects the delete
    full = refresh_group_agg(d, ["g"], AGGS)
    assert full["data"].to_pandas().n.sum() == (
        ((np.arange(1000) * 13) % 1000 >= 100).sum()
    )


def test_state_spec_mismatch_rejected(ray_session, tmp_path):
    d = str(tmp_path / "t")
    T.table_write(rd.from_arrow(_mk(0, 100)), d)
    state = refresh_group_agg(d, ["g"], AGGS)
    T.table_write(rd.from_arrow(_mk(100, 200)), d)
    with pytest.raises(ValueError, match="different keys/aggs"):
        refresh_group_agg(d, ["g"], AGGS[:2], state=state)
    with pytest.raises(ValueError, match="unsupported aggregate"):
        refresh_group_agg(d, ["g"], [("a", "avg", "v")])


def test_nulls_in_agg_column(ray_session, tmp_path):
    d = str(tmp_path / "t")
    t = pa.table(
        {
            "g": pa.array(["a", "a", "b", "b"]),
            "v": pa.array([1, None, None, None], pa.int64()),
            "k": pa.array([0, 1, 2, 3], pa.int64()),
        }
    )
    T.table_write(rd.from_arrow(t), d)
    s = refresh_group_agg(d, ["g"], AGGS)
    rows = {r["g"]: r for r in s["data"].to_pylist()}
    assert rows["a"] == {"g": "a", "s": 1, "n": 2, "lo": 1, "hi": 1}
    # all-null group: sum/min/max null, count(*) still counts rows
    assert rows["b"]["n"] == 2 and rows["b"]["s"] is None


def test_staged_branch_commits_are_invisible(ray_session, tmp_path):
    """WAP isolation: a staging-branch append must NOT leak into the main
    materialized aggregate (neither at build nor at refresh), and the
    version loop must not choke on branch snapshots in between."""
    d = str(tmp_path / "t")
    T.table_write(rd.from_arrow(_mk(0, 1000)).repartition(2), d)
    state = refresh_group_agg(d, ["g"], AGGS)
    # stage rows on an audit branch (newest version number, unpublished)
    T.table_write(rd.from_arrow(_mk(1000, 2000)), d, branch="audit")
    fresh = refresh_group_agg(d, ["g"], AGGS)       # from scratch
    again = refresh_group_agg(d, ["g"], AGGS, state=state)  # incremental
    base = refresh_group_agg(d, ["g"], AGGS, to_version=1)
    assert _sorted(fresh["data"]).equals(_sorted(base["data"]))
    assert _sorted(again["data"]).equals(_sorted(base["data"]))
    # a MAIN append after the staged one still folds incrementally
    T.table_write(rd.from_arrow(_mk(2000, 2500)), d)
    inc = refresh_group_agg(d, ["g"], AGGS, state=again)
    full = refresh_group_agg(d, ["g"], AGGS)
    assert _sorted(inc["data"]).equals(_sorted(full["data"]))
