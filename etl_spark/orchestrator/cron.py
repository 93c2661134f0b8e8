"""Minimal 5-field cron next-fire-time calculator.

The reference delegates to croniter (`croniter(cron_expression,
now).get_next(datetime)`, web_scheduler.py:1382-1383); croniter is not
available here, so this implements the standard POSIX crontab subset
from public documentation: fields `minute hour day-of-month month
day-of-week`, each `*`, `N`, `A-B`, `*/S`, `A-B/S`, or comma lists;
day-of-week 0 and 7 both mean Sunday; dom/dow combine as OR when both
are restricted (the classic vixie-cron rule).
"""

from __future__ import annotations

from datetime import datetime, timedelta

_FIELD_RANGES = ((0, 59), (0, 23), (1, 31), (1, 12), (0, 6))


class CronError(ValueError):
    pass


def _parse_field(spec: str, lo: int, hi: int, dow: bool = False) -> frozenset[int]:
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            if not step_s.isdigit() or int(step_s) == 0:
                raise CronError(f"bad step {step_s!r}")
            step = int(step_s)
        try:
            if part == "*":
                a, b = lo, hi
            elif "-" in part:
                a_s, b_s = part.split("-", 1)
                a, b = int(a_s), int(b_s)
            else:
                a = b = int(part)
        except ValueError as ex:
            raise CronError(f"bad field {part!r}") from ex
        if dow:  # 7 == Sunday == 0
            # vixie cron allows ranges ENDING at 7 ("5-7" = Fri,Sat,Sun):
            # walk the raw 0-7 range and fold 7 onto 0
            if b == 7 and a < 7:
                if not 0 <= a <= 7:
                    raise CronError(f"value out of range in {spec!r}")
                out.update(v % 7 for v in range(a, 8, step))
                continue
            a, b = (0 if a == 7 else a), (0 if b == 7 else b)
            if a == 0 and b == 0 and part not in ("*",):
                out.add(0)
                if step != 1:
                    raise CronError("step on single value")
                continue
        if not (lo <= a <= hi and lo <= b <= hi and a <= b):
            raise CronError(f"value out of range in {spec!r}")
        out.update(range(a, b + 1, step))
    return frozenset(out)


def parse(expr: str) -> tuple[frozenset[int], ...]:
    fields = expr.split()
    if len(fields) != 5:
        raise CronError(f"expected 5 fields, got {len(fields)}: {expr!r}")
    parsed = []
    for spec, (lo, hi), is_dow in zip(
        fields, _FIELD_RANGES, (False, False, False, False, True)
    ):
        parsed.append(_parse_field(spec, lo, hi, dow=is_dow))
    return tuple(parsed)


def next_fire(expr: str, after: datetime) -> datetime:
    """First fire time strictly after ``after`` (croniter.get_next
    semantics). Raises CronError on invalid expressions — the caller
    falls back to interval scheduling, mirroring the reference's
    try/except croniter fallback (web_scheduler.py:1379-1390)."""
    minutes, hours, doms, months, dows = parse(expr)
    dom_star = doms == frozenset(range(1, 32))
    dow_star = dows == frozenset(range(0, 7))

    t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
    for _ in range(366 * 24 * 60):  # < 1 year of minutes; plenty for any valid expr
        if t.month not in months:
            # jump to the 1st of the next month
            t = (t.replace(day=1, hour=0, minute=0) + timedelta(days=32)).replace(day=1)
            continue
        # vixie-cron: if both dom and dow are restricted, match either
        dow_py = (t.weekday() + 1) % 7  # Monday=0 → Sunday=0 convention
        dom_ok = t.day in doms
        dow_ok = dow_py in dows
        day_ok = (dom_ok or dow_ok) if (not dom_star and not dow_star) else (
            dom_ok and dow_ok
        )
        if not day_ok:
            t = t.replace(hour=0, minute=0) + timedelta(days=1)
            continue
        if t.hour not in hours:
            t = t.replace(minute=0) + timedelta(hours=1)
            continue
        if t.minute not in minutes:
            t += timedelta(minutes=1)
            continue
        return t
    raise CronError(f"no fire time within a year for {expr!r}")
