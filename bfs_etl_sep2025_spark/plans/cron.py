"""Five-field cron schedule evaluation (pure Python, no daemon).

The reference drives everything off cron specs on its DAGs:
``'30 * * * *'`` (``dags/dev_db_test.py:34``), ``'0 7 * * *'``
(``dags/s3_data_copy_test.py:26``), ``'@daily'``
(``dags/empty_workflow_example.py:8``) and ``None`` = manual
(``dags/complex_example.py:10``). The engine does not daemonize — the
caller enumerates ticks (``Pipeline.backfill``) or supplies a run date.

Supported field syntax: ``*``, ``N``, ``N-M``, ``*/S``, ``N-M/S`` and
comma-lists thereof; day-of-week 0 or 7 = Sunday (standard cron). As in
cron, if BOTH day-of-month and day-of-week are restricted the union is
matched; the reference never uses that corner but it is implemented for
fidelity.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

ALIASES = {
    "@hourly": "0 * * * *",
    "@daily": "0 0 * * *",
    "@midnight": "0 0 * * *",
    "@weekly": "0 0 * * 0",
    "@monthly": "0 0 1 * *",
    "@yearly": "0 0 1 1 *",
    "@annually": "0 0 1 1 *",
}

_BOUNDS = {
    "minute": (0, 59),
    "hour": (0, 23),
    "dom": (1, 31),
    "month": (1, 12),
    "dow": (0, 7),  # 0 and 7 both mean Sunday
}


def _parse_field(spec: str, lo: int, hi: int, name: str) -> frozenset[int]:
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step <= 0:
                raise ValueError(f"cron {name}: step must be positive in {spec!r}")
        if part == "*":
            rng = range(lo, hi + 1)
        elif "-" in part:
            a, b = part.split("-", 1)
            rng = range(int(a), int(b) + 1)
        else:
            v = int(part)
            rng = range(v, v + 1) if step == 1 else range(v, hi + 1)
        for v in rng[::step] if step > 1 else rng:
            if not (lo <= v <= hi):
                raise ValueError(f"cron {name}: {v} out of range in {spec!r}")
            out.add(v)
    if name == "dow" and 7 in out:
        out.discard(7)
        out.add(0)
    return frozenset(out)


@dataclass(frozen=True)
class CronSchedule:
    minutes: frozenset[int]
    hours: frozenset[int]
    doms: frozenset[int]
    months: frozenset[int]
    dows: frozenset[int]
    #: standard-cron quirk: dom/dow act as a union only when both restricted
    dom_restricted: bool
    dow_restricted: bool
    expr: str

    @classmethod
    def parse(cls, expr: str) -> CronSchedule:
        norm = ALIASES.get(expr.strip(), expr.strip())
        fields = norm.split()
        if len(fields) != 5:
            raise ValueError(f"cron expression needs 5 fields: {expr!r}")
        minute, hour, dom, month, dow = fields
        return cls(
            minutes=_parse_field(minute, *_BOUNDS["minute"], "minute"),
            hours=_parse_field(hour, *_BOUNDS["hour"], "hour"),
            doms=_parse_field(dom, *_BOUNDS["dom"], "dom"),
            months=_parse_field(month, *_BOUNDS["month"], "month"),
            dows=_parse_field(dow, *_BOUNDS["dow"], "dow"),
            dom_restricted=dom != "*",
            dow_restricted=dow != "*",
            expr=expr,
        )

    def _day_matches(self, ts: datetime) -> bool:
        dom_ok = ts.day in self.doms
        dow_ok = ((ts.weekday() + 1) % 7) in self.dows  # python Mon=0 -> cron Sun=0
        if self.dom_restricted and self.dow_restricted:
            return dom_ok or dow_ok
        return dom_ok and dow_ok

    def matches(self, ts: datetime) -> bool:
        return (
            ts.minute in self.minutes
            and ts.hour in self.hours
            and ts.month in self.months
            and self._day_matches(ts)
        )

    def ticks(self, start: datetime, end: datetime) -> list[datetime]:
        """All fire times in [start, end] — the backfill enumeration
        (reference semantics: catchup=True over [start_date, end_date],
        ``dags/s3_data_copy_test.py:24-29``). Walks days, then the (sparse)
        matching hour/minute sets, so a years-long window stays cheap."""
        out: list[datetime] = []
        day = start.replace(hour=0, minute=0, second=0, microsecond=0)
        while day <= end:
            if day.month in self.months and self._day_matches(day):
                for h in sorted(self.hours):
                    for m in sorted(self.minutes):
                        t = day.replace(hour=h, minute=m)
                        if start <= t <= end:
                            out.append(t)
            day += timedelta(days=1)
        return out

    def next_after(self, ts: datetime, limit_days: int = 366 * 4) -> datetime:
        """First fire time strictly after ``ts``."""
        probe = (ts + timedelta(minutes=1)).replace(second=0, microsecond=0)
        horizon = ts + timedelta(days=limit_days)
        ticks = self.ticks(probe, horizon)
        if not ticks:
            raise ValueError(f"no fire time within {limit_days}d for {self.expr!r}")
        return ticks[0]
