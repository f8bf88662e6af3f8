"""Cron schedule evaluation — including the reference's exact specs."""

from __future__ import annotations

from datetime import datetime

import pytest

from bfs_etl_sep2025_spark.plans.cron import CronSchedule


def test_reference_daily_backfill_window():
    """'0 7 * * *' over 2022-07-13..16 -> exactly the 4 daily runs the
    reference's catchup backfill produces (dags/s3_data_copy_test.py:24-29)."""
    s = CronSchedule.parse("0 7 * * *")
    ticks = s.ticks(datetime(2022, 7, 13), datetime(2022, 7, 16, 23, 59))
    assert ticks == [datetime(2022, 7, d, 7, 0) for d in (13, 14, 15, 16)]


def test_reference_hourly():
    """'30 * * * *' (dags/dev_db_test.py:34) fires at :30 every hour."""
    s = CronSchedule.parse("30 * * * *")
    ticks = s.ticks(datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 3, 0))
    assert ticks == [datetime(2024, 1, 1, h, 30) for h in (0, 1, 2)]


def test_daily_alias():
    s = CronSchedule.parse("@daily")
    assert s.matches(datetime(2024, 5, 5, 0, 0))
    assert not s.matches(datetime(2024, 5, 5, 0, 1))


def test_steps_ranges_lists():
    s = CronSchedule.parse("*/15 9-17 * * 1-5")
    assert s.matches(datetime(2024, 1, 3, 9, 45))  # a Wednesday
    assert not s.matches(datetime(2024, 1, 6, 9, 45))  # a Saturday
    assert not s.matches(datetime(2024, 1, 3, 8, 45))
    s2 = CronSchedule.parse("0 0 1,15 * *")
    assert s2.matches(datetime(2024, 2, 15, 0, 0))
    assert not s2.matches(datetime(2024, 2, 14, 0, 0))


def test_dow_sunday_both_spellings():
    for expr in ("0 0 * * 0", "0 0 * * 7"):
        assert CronSchedule.parse(expr).matches(datetime(2024, 1, 7, 0, 0))  # Sunday


def test_dom_dow_union_quirk():
    # Standard cron: both restricted -> union.
    s = CronSchedule.parse("0 0 13 * 5")  # 13th OR Friday
    assert s.matches(datetime(2023, 10, 13, 0, 0))  # Friday the 13th
    assert s.matches(datetime(2023, 10, 20, 0, 0))  # a Friday, not the 13th
    assert s.matches(datetime(2023, 11, 13, 0, 0))  # 13th, a Monday
    assert not s.matches(datetime(2023, 11, 14, 0, 0))


def test_next_after():
    s = CronSchedule.parse("0 7 * * *")
    assert s.next_after(datetime(2022, 7, 13, 7, 0)) == datetime(2022, 7, 14, 7, 0)
    assert s.next_after(datetime(2022, 7, 13, 6, 59)) == datetime(2022, 7, 13, 7, 0)


def test_invalid():
    with pytest.raises(ValueError):
        CronSchedule.parse("0 7 * *")
    with pytest.raises(ValueError):
        CronSchedule.parse("61 * * * *")
