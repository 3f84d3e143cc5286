"""Timestamp formatting (`parse_record_data_from_files.py:150-169`):
epoch-milliseconds -> UTC 'YYYYMMDDHHMMSS', rejecting non-positive
values and years outside [1990, now+10y] (frozen upper bound 2036 so
results don't depend on wall clock)."""

from __future__ import annotations

from datetime import datetime, timezone

_MIN_YEAR = 1990
_MAX_YEAR = 2036  # frozen (reference used now()+10y; wall-clock-free here)


def format_epoch_ms(ms) -> str:
    """epoch ms -> 'YYYYMMDDHHMMSS' or '' when invalid/out of range."""
    try:
        ms = int(ms)
    except (TypeError, ValueError):
        return ""
    if ms <= 0:
        return ""
    try:
        dt = datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)
    except (OverflowError, OSError, ValueError):
        return ""
    if not (_MIN_YEAR <= dt.year <= _MAX_YEAR):
        return ""
    return dt.strftime("%Y%m%d%H%M%S")


def format_elapsed(seconds: float) -> str:
    """Human elapsed-time formatter with the reference's exact tiering
    (`get-openalex.../src/main.rs:545-559`): 'Xh Ym Zs' / 'Ym Zs' /
    'Z.mmms'."""
    total = int(seconds)
    # truncate like the reference's as_secs()/subsec_millis() — no
    # rounding, no carry: 59.9996 -> '59.999s', 60.9996 -> '1m 0s'
    millis = int((seconds - total) * 1000)
    hours, minutes, secs = total // 3600, (total % 3600) // 60, total % 60
    if hours > 0:
        return f"{hours}h {minutes}m {secs}s"
    if minutes > 0:
        return f"{minutes}m {secs}s"
    return f"{secs}.{millis:03d}s"
