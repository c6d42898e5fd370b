"""opening_hours→frequencies parser tests (M14/M17/M18)."""

from __future__ import annotations

import pytest

from osm2gtfs_ray.ops.hours import (
    parse_duration_approx,
    parse_interval_s,
    parse_opening_hours,
    parse_time_s,
    service_id_for,
)


class TestTimeParsing:
    def test_times(self):
        assert parse_time_s("06:30") == 23400
        assert parse_time_s("06:30:15") == 23415
        assert parse_time_s("6:05") == 21900
        assert parse_time_s("06:99") is None
        assert parse_time_s("junk") is None

    def test_interval(self):
        assert parse_interval_s("00:15") == 900
        assert parse_interval_s("15") == 900
        assert parse_interval_s("00:10:30") == 630
        assert parse_interval_s("x") is None


class TestOpeningHours:
    def test_simple_weekday_rule(self):
        rows = parse_opening_hours("Mo-Fr 06:00-22:00", "00:15")
        assert len(rows) == 1
        r = rows[0]
        assert r["day_flags"] == (1, 1, 1, 1, 1, 0, 0)
        assert (r["start_s"], r["end_s"], r["headway_s"]) == (21600, 79200, 900)

    def test_multiple_rules_and_spans(self):
        rows = parse_opening_hours(
            "Mo-Fr 06:00-10:00,16:00-20:00; Sa-Su 08:00-18:00", "10"
        )
        assert len(rows) == 3
        assert rows[2]["day_flags"] == (0, 0, 0, 0, 0, 1, 1)

    def test_day_list_and_wrap(self):
        rows = parse_opening_hours("Mo,We,Fr 06:00-08:00", "20")
        assert rows[0]["day_flags"] == (1, 0, 1, 0, 1, 0, 0)
        wrap = parse_opening_hours("Sa-Mo 06:00-08:00", "20")
        assert wrap[0]["day_flags"] == (1, 0, 0, 0, 0, 1, 1)

    def test_midnight_crossing(self):
        rows = parse_opening_hours("Fr-Sa 22:00-02:00", "30")
        assert rows[0]["end_s"] == 26 * 3600

    def test_garbage_skipped(self):
        assert parse_opening_hours("sunrise-sunset", "10") == []
        assert parse_opening_hours("Mo-Fr 06:00-22:00", "nope") == []


class TestServiceId:
    def test_canonical(self):
        assert service_id_for((1, 1, 1, 1, 1, 1, 1)) == "Mo-Su"
        assert service_id_for((1, 1, 1, 1, 1, 0, 0)) == "Mo-Fr"
        assert service_id_for((0, 0, 0, 0, 0, 1, 1)) == "Sa-Su"
        assert service_id_for((1, 0, 1, 0, 0, 0, 1)) == "Mo,We,Su"


class TestDuration:
    def test_approx(self):
        assert parse_duration_approx("00:19 aproximado") == 19 * 60
        assert parse_duration_approx("01:05") == 3900
        assert parse_duration_approx("não encontrado") is None
