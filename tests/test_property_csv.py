"""Property-based (hypothesis) checks on the distributed CSV cleaner:
for arbitrary cell contents and field counts ≥ 20, cleaning keeps the
row, truncates to exactly 20 fields, and preserves the leading 20
fields verbatim; rows with < 20 fields are quarantined in lenient
mode.  (SURVEY.md §5.4.)"""

from __future__ import annotations

import tempfile
from pathlib import Path

from hypothesis import given, settings, strategies as st

from data_engineering_assessment_spark.schemas import GREEN_TAXI_HEADER
from data_engineering_assessment_spark.sources.green_taxi import clean_lines

N = len(GREEN_TAXI_HEADER)

# CSV cell: printable ASCII minus separators/quotes (the reference
# disables quoting entirely — 01.py:222 — so commas can't be escaped).
cell = st.text(
    alphabet=st.characters(
        codec="ascii", min_codepoint=32, exclude_characters=',"\r\n'
    ),
    max_size=8,
)

rows = st.lists(
    st.lists(cell, min_size=N, max_size=N + 4),  # ≥ 20 fields
    min_size=1,
    max_size=6,
)


def _write_csv(lines: list[str]) -> str:
    d = tempfile.mkdtemp(prefix="dea_prop_")
    p = Path(d) / "data.csv"
    p.write_text("\n".join([",".join(GREEN_TAXI_HEADER)] + lines) + "\n")
    return str(p)


@settings(max_examples=8, deadline=None)
@given(rows)
def test_clean_preserves_first_20_fields(spark, data):
    lines = [",".join(fields) for fields in data]
    # skip rows that collapse to whitespace-only (blank-line semantics)
    expected = [
        ",".join(fields[:N]) for fields, line in zip(data, lines) if line.strip()
    ]
    path = _write_csv(lines)
    got = [r.line for r in clean_lines(spark, path, fail_fast=False).collect()]
    assert sorted(got) == sorted(expected)
    assert all(len(line.split(",")) == N for line in got)


@settings(max_examples=6, deadline=None)
@given(st.lists(cell, min_size=1, max_size=N - 1))
def test_short_rows_quarantined_in_lenient_mode(spark, fields):
    line = ",".join(fields)
    if not line.strip():
        return  # whitespace-only lines are skipped, not quarantined
    path = _write_csv([line])
    got = clean_lines(spark, path, fail_fast=False).collect()
    assert got == []


# ---------------------------------------------------------------------------
# Fixed-width round trip (sources/formats.py)
# ---------------------------------------------------------------------------

# Fixed-width value: printable ASCII without leading/trailing-space
# ambiguity (trailing pad spaces are stripped on read — documented
# format limitation) and without newlines (line-oriented format).
fw_value = st.text(
    alphabet=st.characters(codec="ascii", min_codepoint=33, max_codepoint=126),
    max_size=10,
)


def test_fixed_width_roundtrip_property(spark):
    """For arbitrary in-width ASCII strings and longs, write→read is
    the identity; the hypothesis loop drives the dataset through the
    real Spark writer/reader once per example batch."""
    from hypothesis import HealthCheck, given, settings

    from data_engineering_assessment_spark.sources.formats import (
        read_fixed_width,
        write_fixed_width,
    )

    spec = [("id", 12, "long"), ("s", 12, "string"), ("n", 12, "long")]

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10**10),
                fw_value,
                st.integers(min_value=-(10**10), max_value=10**10),
            ),
            min_size=1,
            max_size=8,
            unique_by=lambda t: t[0],
        )
    )
    def run(rows):
        d = tempfile.mkdtemp(prefix="dea_fw_prop_")
        df = spark.createDataFrame(rows, schema="id long, s string, n long")
        write_fixed_width(df, d, spec)
        back = read_fixed_width(spark, d, spec)
        got = {(r.id, r.s, r.n) for r in back.collect()}
        # even the empty string round-trips (rtrim of an all-pad
        # field yields '', not null)
        want = set(rows)
        assert got == want

    run()
