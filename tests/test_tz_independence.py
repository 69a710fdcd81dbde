"""Session-timezone independence (r9 CORRECTNESS_TZ sweep findings).

The engine pins ``spark.sql.session.timeZone=UTC`` (session.py), but results
must not DEPEND on the pin: events timestamps are wall times (parquet
TIMESTAMP_NTZ), and every query must either (a) keep them as wall-time
calendar math (NTZ, or the load_table LTZ cast whose shift cancels on
render-out), or (b) never extract a session-TZ-dependent absolute epoch
mid-flight.  The r9 sweep found three violations, each fixed:

* ``q_user_value_trend`` — ``unix_seconds`` on the session-cast column baked
  the TZ shift into the regression's x values (now NTZ ``timestampdiff``);
* ``q_stream_topk_types`` — 6-hour ``F.window`` epoch-aligns LTZ instants,
  shifting buckets whenever the offset isn't a multiple of 6 h (now a
  wall-time bucket expression);
* ``q_stream_hourly`` / ``q_stream_enriched`` — 1-hour windows broke under
  fractional-hour offsets like Asia/Kolkata's +5:30 (now NTZ-wall windows).

Asia/Kolkata is the adversary of choice: a fractional-hour offset catches
window-alignment bugs that whole-hour zones (America/Los_Angeles) mask.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# previously-diverging queries + one representative per neighboring class
# (calendar bucketing, gap sessionization, interval join)
QUERIES_UNDER_TEST = [
    "q_user_value_trend",
    "q_stream_topk_types",
    "q_stream_hourly",
    "q_stream_enriched",
    "q_events_hourly",
    "q_sessionization_stream",
    "q_stream_stream_join",
]


def _canon(df):
    # toPandas (Arrow) is the driver contract's rendering: LTZ instants come
    # back as naive wall times in the SESSION timezone, so the load cast's
    # shift cancels.  Plain collect() renders in the python process TZ
    # instead and would show the shift even though the driver never sees it.
    pdf = df.toPandas()
    return sorted(map(str, pdf.sort_index(axis=1).itertuples(index=False)))


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_session_tz_does_not_change_results(spark, name):
    from scalable_data_integration_with_llms_spark.queries import QUERIES

    base_tz = spark.conf.get("spark.sql.session.timeZone")
    assert base_tz == "UTC"
    want = _canon(QUERIES[name](spark, SF))
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        got = _canon(QUERIES[name](spark, SF))
    finally:
        spark.conf.set("spark.sql.session.timeZone", base_tz)
    assert got == want


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_dst_zone_does_not_change_results(spark, name):
    """ADVICE r9 scope check: Kolkata is a FIXED offset; a DST zone
    exercises the offset-changes-midyear case.  The synthetic corpus is
    Jan 2024 — no wall time falls inside America/New_York's 2024-03-10
    spring-forward gap — so results must still be TZ-independent."""
    from scalable_data_integration_with_llms_spark.queries import QUERIES

    base_tz = spark.conf.get("spark.sql.session.timeZone")
    want = _canon(QUERIES[name](spark, SF))
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = _canon(QUERIES[name](spark, SF))
    finally:
        spark.conf.set("spark.sql.session.timeZone", base_tz)
    assert got == want


def test_dst_gap_caveat_is_real(spark):
    """Pin the documented limit (events.py hourly_rollup docstring): a wall
    time INSIDE a spring-forward gap does not exist as a local time, so the
    NTZ→LTZ render cast shifts it — 02:30 on 2024-03-10 America/New_York
    renders as 03:30.  This is why the docs scope the window-boundary claim
    to fixed-offset zones / non-gap wall times rather than 'any TZ'."""
    base_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        row = spark.sql(
            "SELECT CAST(CAST(TIMESTAMP_NTZ'2024-03-10 02:30:00' AS TIMESTAMP)"
            " AS TIMESTAMP_NTZ) AS rendered"
        ).collect()[0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", base_tz)
    assert str(row.rendered) == "2024-03-10 03:30:00"
