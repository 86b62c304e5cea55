"""Gap-fill / forward-fill time-series operator."""

import datetime

from tests.conftest import assert_parity


def test_oracle_parity(spark, duck):
    assert_parity(spark, duck, "events_gap_fill_daily")


def test_gap_fill_semantics(spark):
    """Missing days appear with 0 events and carry the last value;
    leading gaps stay NULL."""
    from velox_hadoop_spark.operators.timeseries import gap_fill_daily

    def ts(day, hour=12):
        return datetime.datetime(2024, 1, day, hour)

    rows = [
        (1, ts(2), 10.0),   # user 1: days 2 and 4 (gap on 3), leading gap on 1
        (1, ts(4), 20.0),
        (2, ts(1), 5.0),    # user 2: only day 1 — days 2-4 forward-fill
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {
        (r.user_id, r.day.day): (r.n_events, r.day_value, r.filled_value)
        for r in gap_fill_daily(ev).collect()
    }
    assert len(got) == 8  # 2 users x 4-day global spine
    assert got[(1, 1)] == (0, None, None)          # leading gap: no carry
    assert got[(1, 2)] == (1, 10.0, 10.0)
    assert got[(1, 3)] == (0, None, 10.0)          # gap filled from day 2
    assert got[(1, 4)] == (1, 20.0, 20.0)
    assert got[(2, 4)] == (0, None, 5.0)           # long carry to spine end
