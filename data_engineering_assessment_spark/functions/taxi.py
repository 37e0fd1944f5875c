"""Derived-column builders (reference part 2, ``02.py:17-103``).

The reference's ``build_query`` is compile-time codegen in Python that
emits a SQL string.  We keep the codegen philosophy but emit native
``Column`` objects, so the same builders compose with the DataFrame
API and stay inside whole-stage codegen; ``as_sql=...`` equivalents
live in the oracle strings of ``plans/``.

Semantics notes (SURVEY.md §2.2):

- hour flags encode the hour in the *session timezone*; the reference
  ran with UTC sessions against UTC-adjusted instants, so flags are
  UTC hours (02.py:35-37).
- ``dow_is_0`` is dead (Spark DAYOFWEEK is 1=Sunday..7=Saturday while
  the comment at 02.py:54-56 assumed 0=Sunday) and Saturday rows get
  all-zero one-hot vectors.  ``one_hot_dow(corrected=False)``
  reproduces that observed behavior for golden parity;
  ``corrected=True`` maps 0=Sunday..6=Saturday properly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# JFK bounding box, verbatim constants from 02.py:85-88.
JFK_LON_MIN, JFK_LON_MAX = -73.794694, -73.776283
JFK_LAT_MIN, JFK_LAT_MAX = 40.640668, 40.651381


def one_hot_hour(ts: Column | str, prefix: str = "Pickup_hour_is_") -> list[Column]:
    """24 int flags ``CASE WHEN HOUR(ts)=h THEN 1 ELSE 0`` (02.py:38-46)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    h = F.hour(ts)
    return [
        F.when(h == i, F.lit(1)).otherwise(F.lit(0)).alias(f"{prefix}{i}") for i in range(24)
    ]


def one_hot_dow(
    ts: Column | str, prefix: str = "Pickup_dow_is_", corrected: bool = False
) -> list[Column]:
    """7 int flags over day-of-week (02.py:48-65).

    ``corrected=False`` compares Spark's 1-based DAYOFWEEK against
    0..6 exactly as the reference does — reproducing the dead
    ``dow_is_0`` and all-zero Saturdays for golden parity.
    """
    ts = F.col(ts) if isinstance(ts, str) else ts
    d = F.dayofweek(ts) - 1 if corrected else F.dayofweek(ts)
    return [
        F.when(d == i, F.lit(1)).otherwise(F.lit(0)).alias(f"{prefix}{i}") for i in range(7)
    ]


def duration_seconds(
    start: Column | str, end: Column | str, name: str = "Duration_seconds"
) -> Column:
    """Epoch-seconds difference as LONG (02.py:73-76).

    Negative durations are kept — 9 exist in the golden data
    (02.py:70-72); clamping would break parity.
    """
    start = F.col(start) if isinstance(start, str) else start
    end = F.col(end) if isinstance(end, str) else end
    # NTZ-safe: route through session-tz TIMESTAMP (no-op for zoned values).
    return (
        end.cast("timestamp").cast("long") - start.cast("timestamp").cast("long")
    ).alias(name)


def in_bbox(
    lon: Column | str,
    lat: Column | str,
    lon_range: tuple[float, float],
    lat_range: tuple[float, float],
) -> Column:
    """Boolean bounding-box predicate with inclusive BETWEEN bounds.

    Bounds stay double literals exactly as the reference writes them
    (02.py:85-88); decimal columns promote to double on comparison in
    both Spark and the oracle engines.
    """
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    return lon.between(*lon_range) & lat.between(*lat_range)


def jfk_flag(name: str = "Pickup_or_dropoff_at_JFK") -> Column:
    """Int flag: pickup OR dropoff inside the JFK box (02.py:78-95)."""
    pred = in_bbox(
        "Pickup_longitude", "Pickup_latitude", (JFK_LON_MIN, JFK_LON_MAX), (JFK_LAT_MIN, JFK_LAT_MAX)
    ) | in_bbox(
        "Dropoff_longitude",
        "Dropoff_latitude",
        (JFK_LON_MIN, JFK_LON_MAX),
        (JFK_LAT_MIN, JFK_LAT_MAX),
    )
    return F.when(pred, F.lit(1)).otherwise(F.lit(0)).alias(name)


_TAXI_DERIVED: list[Column] | None = None
_TAXI_DERIVED_CTX: tuple[str, int] | None = None


def taxi_derived_columns() -> list[Column]:
    """The full 34-column derived set of reference part 2 (02.py:22-103):
    24 hour flags + 7 dow flags (uncorrected, golden semantics) +
    Duration_seconds + Pickup_or_dropoff_at_JFK, appended to ``*``.

    Memoized: Column objects are immutable unbound expression trees,
    and building 34 of them costs ~140 py4j round trips (~0.3 s,
    ~15% of the whole anchor pipeline) — pure driver chatter that a
    repeated pipeline shouldn't re-pay.  The cache is keyed on the
    active SparkContext identity: the trees hold py4j references into
    the JVM gateway, so a full stop()/restart cycle must rebuild them
    rather than hand out dead handles."""
    global _TAXI_DERIVED, _TAXI_DERIVED_CTX
    from pyspark import SparkContext

    # Key on (applicationId, startTime) — stable for the life of the
    # context and never reused across stop()/restart cycles, unlike
    # id(ctx) which CPython can recycle after the old context is GC'd
    # (and which collapses to id(None) when no context is active).
    live = SparkContext._active_spark_context
    ctx = (live.applicationId, live.startTime) if live is not None else None
    if _TAXI_DERIVED is None or ctx is None or _TAXI_DERIVED_CTX != ctx:
        _TAXI_DERIVED_CTX = ctx
        _TAXI_DERIVED = [
            *one_hot_hour("lpep_pickup_datetime"),
            *one_hot_dow("lpep_pickup_datetime", corrected=False),
            duration_seconds("lpep_pickup_datetime", "lpep_dropoff_datetime"),
            jfk_flag(),
        ]
    return list(_TAXI_DERIVED)
