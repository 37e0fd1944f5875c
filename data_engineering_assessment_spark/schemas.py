"""Typed schema registry — declared, never inferred (SURVEY.md §1.2).

``GREEN_TAXI_*`` reproduce the reference's 20-column contract:
header whitelist at ``01.py:26-47``, pyarrow schema at
``01.py:130-151``, type rationale at ``01.py:50-113``.  The driver
corpus schemas mirror ``/root/testdata/sf*/`` parquet footers
(FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference-parity: NYC green-taxi contract (reference 01.py)
# ---------------------------------------------------------------------------

# Exact 20-name header the raw CSV must present (reference 01.py:26-47).
# Note `Lpep_dropoff_datetime` — capitalized oddly in the source header.
GREEN_TAXI_HEADER: tuple[str, ...] = (
    "VendorID",
    "lpep_pickup_datetime",
    "Lpep_dropoff_datetime",
    "Store_and_fwd_flag",
    "RateCodeID",
    "Pickup_longitude",
    "Pickup_latitude",
    "Dropoff_longitude",
    "Dropoff_latitude",
    "Passenger_count",
    "Trip_distance",
    "Fare_amount",
    "Extra",
    "MTA_tax",
    "Tip_amount",
    "Tolls_amount",
    "Ehail_fee",
    "Total_amount",
    "Payment_type",
    "Trip_type",
)

# Normalized column names (reference renames Lpep_dropoff_datetime →
# lpep_dropoff_datetime to match the TLC data dictionary, 01.py:126-133).
GREEN_TAXI_COLUMNS: tuple[str, ...] = tuple(
    "lpep_dropoff_datetime" if c == "Lpep_dropoff_datetime" else c
    for c in GREEN_TAXI_HEADER
)

# Spark equivalents of the reference's pyarrow types (01.py:114-151):
#   int16 → ShortType; timestamp[s, America/New_York] → TimestampType
#   (instants; session tz only affects display); bool ← 'Y'/'N';
#   decimal128(p,s) → DecimalType(p,s).
GREEN_TAXI_SCHEMA = T.StructType(
    [
        T.StructField("VendorID", T.ShortType()),
        T.StructField("lpep_pickup_datetime", T.TimestampType()),
        T.StructField("lpep_dropoff_datetime", T.TimestampType()),
        T.StructField("Store_and_fwd_flag", T.BooleanType()),
        T.StructField("RateCodeID", T.ShortType()),
        T.StructField("Pickup_longitude", T.DecimalType(18, 15)),
        T.StructField("Pickup_latitude", T.DecimalType(17, 15)),
        T.StructField("Dropoff_longitude", T.DecimalType(18, 15)),
        T.StructField("Dropoff_latitude", T.DecimalType(17, 15)),
        T.StructField("Passenger_count", T.ShortType()),
        T.StructField("Trip_distance", T.DecimalType(4, 2)),
        T.StructField("Fare_amount", T.DecimalType(6, 2)),
        T.StructField("Extra", T.DecimalType(6, 2)),
        T.StructField("MTA_tax", T.DecimalType(6, 2)),
        T.StructField("Tip_amount", T.DecimalType(6, 2)),
        T.StructField("Tolls_amount", T.DecimalType(6, 2)),
        T.StructField("Ehail_fee", T.DecimalType(6, 2)),
        T.StructField("Total_amount", T.DecimalType(6, 2)),
        T.StructField("Payment_type", T.ShortType()),
        T.StructField("Trip_type", T.ShortType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver corpus (/root/testdata/sf*/ — FIXTURES.md §B)
# ---------------------------------------------------------------------------

CORPUS_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
