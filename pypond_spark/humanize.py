"""Human-friendly display strings for datetimes and durations.

Driver-side only (never in the Spark hot path): these back
``TimeRange.humanize() / relative_string() / humanize_duration()`` and the
local-time display accessors — the dashboard-facing convenience surface of
the reference (``pypond/range.py:217-265``, ``pypond/util.py:305-380``).

The reference delegates to the third-party ``humanize`` and ``tzlocal``
packages; neither is available here, so this module re-implements the small
subset the reference exercises with the stdlib, preserving the published
output grammar (``'a moment'``, ``'a day'``, ``'7 days'``, ``'2 months'``,
``'1 year, 3 months'``, ``'now'``, ``'... ago'``, ``'... from now'``) that
the reference tests assert (``tests/range_test.py:199-258``).
"""

from __future__ import annotations

import datetime

#: display format used by every human-facing string
#: (reference ``util.py:36``)
HUMAN_FORMAT = "%a, %d %b %Y %H:%M:%S %Z"


def local_tz() -> datetime.tzinfo:
    """The machine's local timezone (stdlib stand-in for ``tzlocal``)."""
    return datetime.datetime.now(datetime.timezone.utc).astimezone().tzinfo


def monthdelta(date: datetime.datetime, delta: int) -> datetime.datetime:
    """Shift ``date`` by ``delta`` months, clamping the day to the target
    month's length (reference ``util.py:281-302``)."""
    month = (date.month + delta) % 12
    year = date.year + (date.month + delta - 1) // 12
    if not month:
        month = 12
    leap = year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)
    lengths = [31, 29 if leap else 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
    day = min(date.day, lengths[month - 1])
    return date.replace(day=day, month=month, year=year)


def format_dt(dtime: datetime.datetime, localize: bool = False) -> str:
    """Format an aware datetime with :data:`HUMAN_FORMAT`, optionally in
    local time (reference ``util.py:305-328``)."""
    if localize:
        dtime = dtime.astimezone(local_tz())
    return dtime.strftime(HUMAN_FORMAT)


def humanize_dt(dtime: datetime.datetime) -> str:
    """Local-time human display (reference ``util.py:331-344``)."""
    return dtime.astimezone(local_tz()).strftime(HUMAN_FORMAT)


def naturaldelta(delta: datetime.timedelta) -> str:
    """English approximation of a duration — 'a moment', '12 hours',
    '2 months', '1 year, 3 months' (the ``humanize.naturaldelta`` grammar
    the reference relies on, ``util.py:366-380``)."""
    if delta < datetime.timedelta(0):
        delta = -delta
    days, seconds = delta.days, delta.seconds
    years, days = divmod(days, 365)
    months = int(days // 30.5)
    if not years and days < 1:
        if seconds == 0:
            return "a moment"
        if seconds == 1:
            return "a second"
        if seconds < 60:
            return f"{seconds} seconds"
        if seconds < 120:
            return "a minute"
        if seconds < 3600:
            return f"{seconds // 60} minutes"
        if seconds < 7200:
            return "an hour"
        return f"{seconds // 3600} hours"
    if not years:
        if days == 1:
            return "a day"
        if not months:
            return f"{days} days"
        if months == 1:
            return "a month"
        return f"{months} months"
    if years == 1:
        if not months and not days:
            return "a year"
        if not months:
            return f"1 year, {days} days"
        if months == 1:
            return "1 year, 1 month"
        return f"1 year, {months} months"
    return f"{years} years"


def naturaltime(
    dtime: datetime.datetime,
    now: datetime.datetime | None = None,
) -> str:
    """'23 minutes ago' / 'now' / 'a day from now' relative display (the
    ``humanize.naturaltime`` grammar used by ``relative_string``,
    reference ``util.py:347-363``). ``now`` is injectable for tests."""
    now = now or datetime.datetime.now(datetime.timezone.utc)
    delta = now - dtime
    phrase = naturaldelta(delta)
    if phrase == "a moment":
        return "now"
    return f"{phrase} ago" if delta >= datetime.timedelta(0) \
        else f"{phrase} from now"


def humanize_duration(delta: datetime.timedelta) -> str:
    """Duration display — reference ``util.py:366-380``."""
    return naturaldelta(delta)
