"""Golden replay tests — the four reference queries on the reference's own
dataset must reproduce the file-order goldens pinned in FIXTURES.md §2.

The reference CSV is read in place from /root/reference (read-only); tests
skip if it's absent. A pure-Python replay of each Flink algorithm
(documented semantics, not copied code) cross-checks the Spark results row
by row, so parity doesn't rest only on the spot values in FIXTURES.md.
"""

from __future__ import annotations

import csv

import pytest
from pyspark.sql import functions as F

from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
    final_max,
    running_max,
    rows_between_breaches,
    tumbling_count_window_avg,
)


@pytest.fixture(scope="module")
def rows(hdfc_path):
    """(date, symbol, high, close, volume) in file order — cols 0,1,5,8,10,
    the exact indices the reference consumes (SURVEY.md §1.3)."""
    out = []
    with open(hdfc_path) as f:
        reader = csv.reader(f)
        next(reader)  # header
        for r in reader:
            out.append((r[0], r[1], float(r[5]), float(r[8]), int(r[10])))
    return out


def test_dataset_shape(rows):
    assert len(rows) == 5204
    assert rows[0][0] == "2000-01-03"
    assert rows[-1][0] == "2020-11-27"


# --- W1: running max Close per year (MaximumClosingPrice.java:47-82) ---


def test_w1_running_max_close_per_year(quotes, rows):
    df = quotes.withColumn("yr", F.year("date"))
    got = (
        running_max(df, ["yr"], ["date", "row_id"], "close", "max_close_so_far")
        .select("yr", "close", "max_close_so_far")
        .orderBy("date", "row_id")
        .collect()
    )
    assert len(got) == 5204

    # replay: ValueState per year, state = max(state, close), emit each row
    state: dict[int, float] = {}
    expected = []
    for date, _sym, _high, close, _vol in rows:
        yr = int(date[:4])
        state[yr] = max(state.get(yr, close), close)
        expected.append((yr, state[yr]))
    for (yr, _close, got_max), (eyr, emax) in zip(got, expected):
        assert yr == eyr and got_max == pytest.approx(emax)


def test_w1_final_max_per_year(quotes):
    df = quotes.withColumn("yr", F.year("date"))
    finals = {r["yr"]: r["max_value"] for r in final_max(df, ["yr"], "close").collect()}
    assert len(finals) == 21
    # FIXTURES.md §2 spot values
    assert finals[2000] == pytest.approx(561.55)
    assert finals[2001] == pytest.approx(720.35)
    assert finals[2004] == pytest.approx(803.7)
    assert finals[2019] == pytest.approx(2445.15)
    assert finals[2020] == pytest.approx(2492.3)


# --- W2: tumbling 50-row average High (RollingAverageHighPrice.java:56-113) ---


def test_w2_rejects_nonpositive_window(quotes):
    with pytest.raises(ValueError, match="window_size"):
        tumbling_count_window_avg(quotes, ["symbol"], ["date", "row_id"], "high", 0)


def test_w2_count_window_avg(quotes, rows):
    got = (
        tumbling_count_window_avg(quotes, ["symbol"], ["date", "row_id"], "high", 50)
        .orderBy("cycle")
        .collect()
    )
    # 5204 rows → floor(5204 / 51) = 102 complete cycles (FIXTURES.md)
    assert len(got) == 102
    assert got[0]["avg_value"] == pytest.approx(352.888, abs=5e-4)
    assert got[1]["avg_value"] == pytest.approx(463.035, abs=5e-4)
    assert got[2]["avg_value"] == pytest.approx(519.082, abs=5e-4)

    # replay: count+sum state; rows 1..50 accumulate, row 51 triggers
    # emit(sum/50) and is discarded (the 51st value enters no window)
    expected = []
    count, total = 0, 0.0
    for _date, _sym, high, _close, _vol in rows:
        if count < 50:
            count += 1
            total += high
        else:
            expected.append(total / 50)
            count, total = 0, 0.0
    for g, e in zip(got, expected):
        assert g["avg_value"] == pytest.approx(e)


# --- W3: rows between Close>=300 breaches (DaysSincePriceThreshold.java:61-102) ---


def test_w3_rows_between_breaches(quotes, rows):
    got = (
        rows_between_breaches(
            quotes,
            ["symbol"],
            ["date", "row_id"],
            F.col("close") >= 300,
            emit_cols=["date", "symbol"],
        )
        .orderBy("date")
        .collect()
    )
    assert len(got) == 5191  # FIXTURES.md cardinality
    first5 = [(str(r["date"]), r["rows_since_prev_breach"]) for r in got[:5]]
    assert first5 == [
        ("2000-01-04", 1),
        ("2000-01-17", 8),
        ("2000-01-18", 0),
        ("2000-01-19", 0),
        ("2000-01-25", 3),
    ]
    last2 = [(str(r["date"]), r["rows_since_prev_breach"]) for r in got[-2:]]
    assert last2 == [("2020-11-26", 0), ("2020-11-27", 0)]

    # replay: ListState of sub-threshold closes; breach emits len + clears
    expected = []
    pending = 0
    for date, _sym, _high, close, _vol in rows:
        if close >= 300:
            expected.append((date, pending))
            pending = 0
        else:
            pending += 1
    assert [(d, n) for d, n in expected] == [(str(r["date"]), r["rows_since_prev_breach"]) for r in got]


# --- W4: running max Volume per (year, month) (MaxTradeVolumePerYearPerMonth.java:53-91) ---


def test_w4_running_max_volume_composite_key(quotes, rows):
    df = quotes.withColumn("yr", F.year("date")).withColumn("mo", F.month("date"))
    got = (
        running_max(df, ["yr", "mo"], ["date", "row_id"], "volume", "max_volume_so_far")
        .select("yr", "mo", "max_volume_so_far")
        .orderBy("date", "row_id")
        .collect()
    )
    assert len(got) == 5204
    # docstring-pinned first two emissions (MaxTradeVolumePerYearPerMonth.java:21-22)
    assert (got[0]["yr"], got[0]["mo"], got[0]["max_volume_so_far"]) == (2000, 1, 22744)
    assert (got[1]["yr"], got[1]["mo"], got[1]["max_volume_so_far"]) == (2000, 1, 255251)

    state: dict[tuple[int, int], int] = {}
    for (yr, mo, got_max), (date, _s, _h, _c, vol) in zip(got, rows):
        key = (int(date[:4]), int(date[5:7]))
        state[key] = max(state.get(key, vol), vol)
        assert (yr, mo) == key and got_max == state[key]


def test_w4_final_max_per_year_month(quotes):
    df = quotes.withColumn("yr", F.year("date")).withColumn("mo", F.month("date"))
    finals = {(r["yr"], r["mo"]): r["max_value"] for r in final_max(df, ["yr", "mo"], "volume").collect()}
    assert len(finals) == 251  # FIXTURES.md distinct keys
    assert finals[(2000, 1)] == 1449638
    assert finals[(2000, 2)] == 1457178
    assert finals[(2020, 10)] == 16829628
    assert finals[(2020, 11)] == 10179511
