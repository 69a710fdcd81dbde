"""Property test for the ordered-funnel operator: random event layouts
(duplicate timestamps, stage noise, arbitrary interleavings) vs a
brute-force reference of the declared semantics — stage i qualifies iff
some qualifying stage-(i-1) event is STRICTLY earlier."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scalable_data_integration_with_llms_spark.operators.funnel import funnel_user_flags

STAGES = ["a", "b", "c"]
TYPES = STAGES + ["x"]  # noise type


@st.composite
def event_sets(draw):
    n = draw(st.integers(1, 14))
    return [
        (
            i,  # event_id
            draw(st.integers(0, 5)),  # ts (small domain -> many ties)
            draw(st.integers(0, 2)),  # user_id
            draw(st.sampled_from(TYPES)),
        )
        for i in range(n)
    ]


def brute_force(events):
    flags = {}
    users = {u for _, _, u, _ in events}
    for u in users:
        ev = [(t, i, ty) for i, t, uu, ty in events if uu == u]
        did = []
        # stage 0: any matching event; qualifying ts set = all its ts
        qual_ts = [t for t, _, ty in ev if ty == STAGES[0]]
        did.append(1 if qual_ts else 0)
        for s in STAGES[1:]:
            prev_min = min(qual_ts) if qual_ts else None
            qual_ts = [
                t for t, _, ty in ev if ty == s and prev_min is not None and prev_min < t
            ]
            did.append(1 if qual_ts else 0)
        flags[u] = tuple(did)
    return flags


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=event_sets())
def test_funnel_matches_brute_force(spark, events):
    df = spark.createDataFrame(
        events, "event_id int, ts int, user_id int, event_type string"
    )
    got = {
        r.user_id: (r.did_0, r.did_1, r.did_2)
        for r in funnel_user_flags(df, STAGES).collect()
    }
    assert got == brute_force(events)
