"""Property tests for the integer-exact algebra of round-3 operators:
Kneser-Ney probabilities against an exact-fractions reference, and the
bucketized interval-overlap join against brute force on random layouts
that stress bucket boundaries."""

from datetime import datetime, timedelta
from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", "srcX", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_kn_matches_exact_fractions(spark, tmp_path):
    from scalable_data_integration_with_llms_spark.queries import QUERIES

    texts = [
        "the cat sat on the mat the cat ran",
        "the dog sat on the rug the dog ran fast",
        "a cat and a dog sat on the mat",
        "the cat sat on the mat again and again",
    ]
    sf = _write_docs(spark, tmp_path, texts)
    # exact-fractions reference of the registered estimate
    bigrams = {}
    unigrams_after = {}
    for t in texts:
        ws = t.split(" ")
        for a, b in zip(ws, ws[1:]):
            bigrams[(a, b)] = bigrams.get((a, b), 0) + 1
    c1 = {}
    n1f = {}
    n1r = {}
    for (a, b), c in bigrams.items():
        c1[a] = c1.get(a, 0) + c
        n1f[a] = n1f.get(a, 0) + 1
        n1r[b] = n1r.get(b, 0) + 1
    n_types = len(bigrams)
    got = QUERIES["q_kn_bigram_lm"](spark, sf).collect()
    assert got, "no bigrams emitted"
    for r in got:
        a = max(4 * r.c12 - 3, 0) * n_types + 3 * n1f[r.w1] * n1r[r.w2]
        expect_milli = (a * 1_000_000) // (4 * c1[r.w1] * n_types)
        assert r.kn_prob_milli == expect_milli, (r.w1, r.w2)
        # and the full distribution over SEEN bigrams never exceeds 1
    for w1 in {r.w1 for r in got}:
        total = sum(
            Fraction(
                max(4 * c - 3, 0) * n_types + 3 * n1f[w1] * n1r[w2],
                4 * c1[w1] * n_types,
            )
            for (a, w2), c in ((k, v) for k, v in bigrams.items() if k[0] == w1)
            for _ in [0]
        )
        assert total <= 1


EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


@st.composite
def session_layouts(draw):
    # timestamps in minutes over two days, gap > 30 min splits sessions;
    # values near 6-hour bucket edges (360-minute multiples) stress the
    # exactly-once rule
    n = draw(st.integers(2, 16))
    out = []
    for i in range(n):
        user = draw(st.integers(0, 3))
        minute = draw(
            st.one_of(
                st.integers(0, 2880),
                st.sampled_from([0, 359, 360, 361, 719, 720, 721, 1439, 1440]),
            )
        )
        out.append((i, minute, user))
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(layout=session_layouts())
def test_interval_overlap_matches_bruteforce(spark, tmp_path_factory, layout):
    from scalable_data_integration_with_llms_spark.queries import QUERIES

    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(minutes=m), u, "view", 1.0, "")
        for i, m, u in layout
    ]
    tmp = tmp_path_factory.mktemp("ivl")
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp / "events.parquet"))

    # brute force: sessionize per user (30-min gap), count overlapping
    # cross-user session pairs per user
    by_user = {}
    for i, m, u in sorted(layout, key=lambda x: (x[2], x[1], x[0])):
        by_user.setdefault(u, []).append(m)
    spans = []
    for u, ms in by_user.items():
        start = prev = ms[0]
        for m in ms[1:]:
            if m - prev > 30:
                spans.append((u, start, prev))
                start = m
            prev = m
        spans.append((u, start, prev))
    expect = {}
    for ua, sa, ea in spans:
        cnt = sum(
            1 for ub, sb, eb in spans if ub != ua and sa <= eb and sb <= ea
        )
        if cnt:
            expect[ua] = expect.get(ua, 0) + cnt
    got = {
        r.user_id: r.n_overlaps
        for r in QUERIES["q_session_overlap_join"](spark, str(tmp)).collect()
    }
    assert got == expect
