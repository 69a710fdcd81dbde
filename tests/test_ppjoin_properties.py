"""Property test for prefix-filtered AllPairs/PPJoin (SURVEY §5(d) style):
random element-set instances vs a brute-force Python reference.  Prefix
filtering must be LOSSLESS — the (df asc, element asc)-ordered prefixes of
length |x| − ceil(t·|x|) + 1 plus the length filter must emit EXACTLY the
pairs with Jaccard ≥ t_num/t_den: identical sets, disjoint sets, singleton
sets, skewed document frequencies, and both thresholds are all reachable
from the strategy."""

from fractions import Fraction
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scalable_data_integration_with_llms_spark.operators.dedup import ppjoin_pairs


@st.composite
def instances(draw):
    n = draw(st.integers(2, 8))
    # tiny element alphabet → heavy overlap, shared heavy hitters, exact
    # duplicates, and ties in the (df, element) global order
    elem = st.text(alphabet="xyz", min_size=1, max_size=2)
    sets = [draw(st.sets(elem, min_size=1, max_size=5)) for _ in range(n)]
    t = draw(st.sampled_from([(1, 2), (3, 5), (2, 3), (4, 5)]))
    return sets, t


def brute_force(sets, t_num, t_den):
    out = {}
    for a, b in combinations(range(len(sets)), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if t_den * inter >= t_num * union:
            out[(a, b)] = (inter, union)
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(inst=instances())
def test_ppjoin_matches_brute_force(spark, inst):
    sets, (t_num, t_den) = inst
    rows = [(doc, e) for doc, s in enumerate(sets) for e in sorted(s)]
    df = spark.createDataFrame(rows, "doc bigint, shingle string")
    got = {
        (r.doc_a, r.doc_b): (r.n_int, r.n_union)
        for r in ppjoin_pairs(df, t_num=t_num, t_den=t_den).collect()
    }
    assert got == brute_force(sets, t_num, t_den)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(inst=instances())
def test_ppjoin_duplicate_input_rows_are_contract_safe(spark, inst):
    """Duplicate (doc, element) rows must not corrupt df counts, prefix
    lengths, or the intersection arrays: ppjoin_pairs distincts its input
    up front (ADVICE r12), so a frame with every row tripled produces the
    same pairs as the clean frame — i.e. brute force over the SETS."""
    sets, (t_num, t_den) = inst
    rows = [(doc, e) for doc, s in enumerate(sets) for e in sorted(s)] * 3
    df = spark.createDataFrame(rows, "doc bigint, shingle string")
    got = {
        (r.doc_a, r.doc_b): (r.n_int, r.n_union)
        for r in ppjoin_pairs(df, t_num=t_num, t_den=t_den).collect()
    }
    assert got == brute_force(sets, t_num, t_den)


@settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
@given(inst=instances())
def test_positional_bound_is_lossless_at_first_meeting_element(inst):
    """Pure-Python pin of the positional filter's losslessness argument
    (no Spark): order both docs' elements by the global (df asc, element
    asc) total order; for every pair with Jaccard ≥ t, at the pair's FIRST
    shared element the bound 1 + min(|a|−p_a, |b|−p_b) must reach the
    minimum overlap α = ceil(t·(|a|+|b|)/(1+t)) — the row the Spark filter
    must keep.  (Non-first rows may be pruned; the distinct only needs
    one survivor per pair.)"""
    sets, (t_num, t_den) = inst
    df = {}
    for s in sets:
        for e in s:
            df[e] = df.get(e, 0) + 1
    order = {e: i for i, e in enumerate(sorted(df, key=lambda e: (df[e], e)))}
    for a, b in combinations(range(len(sets)), 2):
        inter = sets[a] & sets[b]
        union = len(sets[a] | sets[b])
        if not inter or t_den * len(inter) < t_num * union:
            continue
        la = sorted(sets[a], key=order.get)
        lb = sorted(sets[b], key=order.get)
        first = min(inter, key=order.get)
        p_a, p_b = la.index(first) + 1, lb.index(first) + 1
        ub = 1 + min(len(la) - p_a, len(lb) - p_b)
        # (t_num+t_den)·ub ≥ t_num·(|a|+|b|)  ⟺  ub ≥ α
        assert (t_num + t_den) * ub >= t_num * (len(la) + len(lb)), (
            sets[a], sets[b], first, p_a, p_b, ub)


def test_ppjoin_jaccard_is_exact_ratio(spark):
    """The reported jaccard is the plain double division of the integer
    counts — the same two ints any engine would divide."""
    rows = [(0, "a"), (0, "b"), (0, "c"), (1, "a"), (1, "b"), (1, "d")]
    df = spark.createDataFrame(rows, "doc bigint, shingle string")
    out = ppjoin_pairs(df, t_num=1, t_den=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_int, r.n_union) == (2, 4)
    assert r.jaccard == 2 / 4
    assert Fraction(r.n_int, r.n_union) >= Fraction(1, 2)
