"""Time parsing utilities.

Same semantics as the reference's time helpers
(ref: pkg/utils/timeutils.go:40-151): durations are ``<n><unit>`` with
units s/m/h/d; absolute times are Unix milliseconds, RFC3339, or
``now`` / ``now-<dur>`` / ``now+<dur>``. All engine-internal timestamps
are int64 Unix **milliseconds** (ref: pkg/appender/appender.go:42-43).
"""

from __future__ import annotations

import re
import time
from datetime import datetime, timezone

from v3io_tsdb_spark.errors import BadRequest

_DURATION_RE = re.compile(r"^(\d+)([smhd])$")
_MS_PER_UNIT = {"s": 1_000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}

# Engine-valid time range, ref: pkg/appender/appender.go:289-294
# (t must be between 1970 and 2400)
MIN_TIME_MS = 0
MAX_TIME_MS = 13_569_465_600_000  # year 2400


def str2duration_ms(val: str | int | float) -> int:
    """Parse ``"90s" | "15m" | "2h" | "7d"`` (or a raw int of ms) to ms.

    ref: pkg/utils/timeutils.go:40-74 (Str2duration)
    """
    if isinstance(val, (int, float)):
        return int(val)
    s = str(val).strip()
    if not s:
        raise BadRequest("empty duration string")
    if s.isdigit():
        return int(s)
    m = _DURATION_RE.match(s)
    if not m:
        raise BadRequest(
            f"invalid duration {val!r}: expected <number><s|m|h|d>"
        )
    return int(m.group(1)) * _MS_PER_UNIT[m.group(2)]


def str2unix_ms(val: str | int | float | datetime | None, now_ms: int | None = None) -> int | None:
    """Parse an absolute time to Unix ms.

    Accepts Unix-ms ints, RFC3339 strings, ``now``, ``now-<dur>``,
    ``now+<dur>`` and datetimes. ref: pkg/utils/timeutils.go:80-112
    (Str2unixTime).
    """
    if val is None:
        return None
    if isinstance(val, datetime):
        if val.tzinfo is None:
            val = val.replace(tzinfo=timezone.utc)
        return int(val.timestamp() * 1000)
    if isinstance(val, (int, float)):
        return int(val)
    s = str(val).strip()
    if not s:
        return None
    if s.startswith("now"):
        now = int(time.time() * 1000) if now_ms is None else now_ms
        rest = s[3:]
        if not rest:
            return now
        sign = 1 if rest[0] == "+" else -1
        if rest[0] not in "+-":
            raise BadRequest(f"invalid relative time {val!r}")
        return now + sign * str2duration_ms(rest[1:])
    if re.fullmatch(r"-?\d+", s):
        return int(s)
    # RFC3339
    try:
        return str2unix_ms(datetime.fromisoformat(s.replace("Z", "+00:00")))
    except ValueError as exc:
        raise BadRequest(f"invalid time {val!r}: {exc}") from exc


def get_time_range(
    from_val, to_val, last: str | int | None = None, now_ms: int | None = None
) -> tuple[int, int]:
    """Resolve a query (from, to) pair in ms.

    ``last`` (e.g. "1h") means [now-last, now]. Defaults mirror the
    reference: missing to = now, missing from = to - 1h.
    ref: pkg/utils/timeutils.go:114-151 (GetTimeFromRange)
    """
    now = int(time.time() * 1000) if now_ms is None else now_ms
    if last:
        return now - str2duration_ms(last), now
    to_ms = str2unix_ms(to_val, now_ms=now)
    if to_ms is None:
        to_ms = now
    from_ms = str2unix_ms(from_val, now_ms=now)
    if from_ms is None:
        from_ms = to_ms - 3_600_000
    if to_ms < from_ms:
        raise BadRequest(f"from ({from_ms}) must be <= to ({to_ms})")
    return from_ms, to_ms


def rate_to_hours(samples_ingestion_rate: str) -> int:
    """Parse an ingestion-rate string ``"[0-9]+/[smh]"`` to samples per
    hour (ref: pkg/tsdb/schema/schema.go:166-196 rateToHours; goldens
    pkg/tsdb/schema/schema_test.go:30-56 — "1/s"→3600, "12/m"→720,
    "2/h"→2; "1m"/"1/t"/negatives/empty are errors). The reference
    sizes chunk/partition intervals from this; the Spark engine keeps
    it as validated metadata (Parquet needs no rate-based sizing)."""
    err = BadRequest(
        'invalid samples ingestion rate. The rate must be of the format '
        '"[0-9]+/[smh]". For example, "12/m"'
    )
    s = samples_ingestion_rate or ""
    if len(s) < 3 or s[-2] != "/":
        raise err
    unit = s[-1]
    try:
        n = int(s[:-2])
    except ValueError:
        raise err from None
    if n <= 0:
        raise BadRequest(
            f"invalid samples ingestion rate ({s[:-2]}). "
            "The rate cannot have a negative number of samples"
        )
    if unit == "s":
        return n * 3600
    if unit == "m":
        return n * 60
    if unit == "h":
        return n
    raise err
