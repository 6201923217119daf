"""asof_join: DuckDB ASOF JOIN parity, unmatched-null behavior,
reshard invariance, directions, and degenerate inputs."""
import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _tables(n_left=400, n_right=300, n_keys=20, seed=5):
    rng = np.random.default_rng(seed)
    left = pa.table({
        "eid": pa.array(np.arange(n_left, dtype=np.int64)),
        "k": pa.array(rng.integers(0, n_keys, n_left).astype(np.int64)),
        "t": pa.array(rng.integers(0, 1000, n_left).astype(np.int64)),
        "lv": pa.array(rng.standard_normal(n_left)),
    })
    right = pa.table({
        "k": pa.array(rng.integers(0, n_keys, n_right).astype(np.int64)),
        "t": pa.array(rng.integers(0, 1000, n_right).astype(np.int64)),
        "rv": pa.array(rng.standard_normal(n_right)),
    })
    # unique (k, t) on the right so the oracle is unambiguous
    import pandas as pd
    r = right.to_pandas().drop_duplicates(["k", "t"])
    return left, pa.Table.from_pandas(r, preserve_index=False)


def _duck_asof(left, right):
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    return con.sql("""
        SELECT l.eid, l.k, l.t, l.lv, r.rv
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.t
        ORDER BY l.eid
    """).arrow()


def _rows(t: pa.Table):
    t = t.sort_by("eid")
    return [tuple(None if v is None else round(v, 9) if isinstance(v, float)
                  else v for v in row)
            for row in zip(*[t[c].to_pylist() for c in t.column_names])]


def test_asof_matches_duckdb(ray_session):
    import ray
    import ray.data as rd
    from raphtory_ray.data.asof import asof_join
    left, right = _tables()
    got = asof_join(rd.from_arrow(left).repartition(5),
                    rd.from_arrow(right).repartition(3), by="k", on="t")
    t = (pa.concat_tables(ray.get(got.to_arrow_refs()))
         .select(["eid", "k", "t", "lv", "rv"]))
    assert _rows(t) == _rows(_duck_asof(left, right))


def test_asof_reshard_invariant(ray_session):
    import ray
    import ray.data as rd
    from raphtory_ray.data.asof import asof_join
    left, right = _tables(seed=9)
    outs = []
    for pl, pr in [(1, 1), (7, 2)]:
        got = asof_join(rd.from_arrow(left).repartition(pl),
                        rd.from_arrow(right).repartition(pr),
                        by="k", on="t")
        outs.append(_rows(pa.concat_tables(ray.get(got.to_arrow_refs()))
                          .select(["eid", "k", "t", "lv", "rv"])))
    assert outs[0] == outs[1]


def test_asof_empty_right_and_forward(ray_session):
    import ray
    import ray.data as rd
    from raphtory_ray.data.asof import asof_join
    left, right = _tables(n_left=50, n_right=40, seed=2)
    empty = right.slice(0, 0)
    got = asof_join(rd.from_arrow(left), rd.from_arrow(empty),
                    by="k", on="t")
    t = pa.concat_tables(ray.get(got.to_arrow_refs()))
    assert t.num_rows == 50 and t["rv"].null_count == 50

    fwd = asof_join(rd.from_arrow(left).repartition(4),
                    rd.from_arrow(right), by="k", on="t",
                    direction="forward")
    t = (pa.concat_tables(ray.get(fwd.to_arrow_refs()))
         .select(["eid", "k", "t", "lv", "rv"]))
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.sql("""
        SELECT l.eid, l.k, l.t, l.lv,
               (SELECT r.rv FROM r WHERE r.k = l.k AND r.t >= l.t
                ORDER BY r.t LIMIT 1) AS rv
        FROM l ORDER BY l.eid
    """).arrow()
    assert _rows(t) == _rows(want)


def test_asof_collision_raises(ray_session):
    import ray.data as rd
    from raphtory_ray.data.asof import asof_join
    left, right = _tables(n_left=10, n_right=10)
    bad = right.rename_columns(["k", "t", "lv"])  # collides with left.lv
    with pytest.raises(ValueError, match="collide"):
        asof_join(rd.from_arrow(left), rd.from_arrow(bad), by="k", on="t")
