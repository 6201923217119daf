"""Calendar-interval WindowSet alignment — fixtures transcribed from
python/tests/test_base_install/test_graphdb/test_rolling_expanding_alignment
.py (month/day/hybrid windows, smallest-unit rule, epoch-week buckets,
discrete-ms non-alignment)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa


def _ms(*a):
    return int(dt.datetime(*a, tzinfo=dt.timezone.utc).timestamp() * 1000)


T1 = _ms(2025, 3, 15, 14, 37, 52)
T2 = _ms(2025, 7, 8, 9, 12, 5)
T3 = _ms(2025, 11, 22, 21, 45, 30)


def _gf(ray_session, times):
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    t = np.array(times, np.int64)
    return GraphFrame(rd.from_arrow(pa.table({
        "src": pa.array(np.zeros(len(t), np.int64)),
        "dst": pa.array(np.ones(len(t), np.int64)),
        "t": pa.array(t),
        "event_id": pa.array(np.arange(len(t), dtype=np.int64))})), 2)


def test_rolling_month_alignment(ray_session):
    from raphtory_ray.algorithms.extra import rolling
    g = _gf(ray_session, [T1, T2, T3])
    w = rolling(g, "1 month")
    assert (w[0].start, w[0].end) == (_ms(2025, 3, 1), _ms(2025, 4, 1))
    assert (w[1].start, w[1].end) == (_ms(2025, 4, 1), _ms(2025, 5, 1))
    assert (w[2].start, w[2].end) == (_ms(2025, 5, 1), _ms(2025, 6, 1))
    assert (w[-1].start, w[-1].end) == (_ms(2025, 11, 1), _ms(2025, 12, 1))


def test_rolling_day_alignment(ray_session):
    from raphtory_ray.algorithms.extra import rolling
    g = _gf(ray_session, [T1, T2, T3])
    w = rolling(g, "1 day")
    assert (w[0].start, w[0].end) == (_ms(2025, 3, 15), _ms(2025, 3, 16))
    assert (w[1].start, w[1].end) == (_ms(2025, 3, 16), _ms(2025, 3, 17))
    assert (w[-1].start, w[-1].end) == (_ms(2025, 11, 22), _ms(2025, 11, 23))


def test_rolling_month_and_day(ray_session):
    from raphtory_ray.algorithms.extra import rolling
    g = _gf(ray_session, [T1, T2, T3])
    w = rolling(g, "1 month and 1 day")
    assert (w[0].start, w[0].end) == (_ms(2025, 3, 15), _ms(2025, 4, 16))
    assert (w[1].start, w[1].end) == (_ms(2025, 4, 16), _ms(2025, 5, 17))
    assert (w[2].start, w[2].end) == (_ms(2025, 5, 17), _ms(2025, 6, 18))
    assert (w[-1].start, w[-1].end) == (_ms(2025, 10, 22), _ms(2025, 11, 23))


def test_rolling_smallest_unit_of_window_and_step(ray_session):
    from raphtory_ray.algorithms.extra import rolling
    g = _gf(ray_session, [T1, T2, T3])
    w = rolling(g, "1 month", step="1 day")
    assert (w[0].start, w[0].end) == (_ms(2025, 2, 16), _ms(2025, 3, 16))
    assert (w[1].start, w[1].end) == (_ms(2025, 2, 17), _ms(2025, 3, 17))
    assert (w[-1].start, w[-1].end) == (_ms(2025, 10, 23), _ms(2025, 11, 23))


def test_rolling_discrete_ms_unaligned(ray_session):
    from raphtory_ray.algorithms.extra import rolling
    g = _gf(ray_session, [T1, T2, T3])
    w = rolling(g, 86_400_000)
    # ends anchored at the raw earliest time, NOT midnight
    assert w[0].end == T1 + 86_400_000


def test_expanding_day_alignment_and_overrides(ray_session):
    from raphtory_ray.algorithms.extra import expanding
    g = _gf(ray_session, [T1, T2, T3])
    w = expanding(g, "1 day")
    assert w[0].end == _ms(2025, 3, 16)
    assert w[1].end == _ms(2025, 3, 17)
    assert w[-1].end == _ms(2025, 11, 23)
    wu = expanding(g, "1 day", alignment_unit="unaligned")
    assert wu[0].end == _ms(2025, 3, 16, 14, 37, 52)
    assert wu[-1].end == _ms(2025, 11, 23, 14, 37, 52)
    wm = expanding(g, "1 day", alignment_unit="month")
    assert wm[0].end == _ms(2025, 3, 2)
    assert wm[-1].end == _ms(2025, 11, 23)
    ww = expanding(g, "1 day", alignment_unit="weeks")
    # weeks = multiples of 7 days since 1970-01-01 (a Thursday): the floor
    # of 2025-03-15 is Thursday 2025-03-13
    assert ww[0].end == _ms(2025, 3, 14)
    assert ww[-1].end == _ms(2025, 11, 23)
