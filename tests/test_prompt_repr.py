"""Prompt repr-template catalog (round 5): golden-renderer fixtures pinning
each template's exact layout, plus Spark↔golden parity for every row.

The oracle already byte-compares Spark vs the golden renderer at the driver
level; these tests additionally pin hand-written literals so a transcription
error in the SHARED constants (which both sides use) cannot slip through.
"""

from __future__ import annotations

import json

import pytest

from scalable_data_integration_with_llms_spark.functions import prompt_repr as PR

SF_DIR = "/root/testdata/sf0.001"

ORDERS_COLS = [
    ("o_orderkey", "bigint"), ("o_custkey", "bigint"),
    ("o_orderstatus", "varchar(1)"), ("o_totalprice", "double"),
    ("o_orderdate", "timestamp"), ("o_orderpriority", "varchar(15)"),
]


def test_ranked_candidates_match_engine_ordering():
    # orderkey query: o_orderkey is a 0-distance stripped match and must rank 1
    cands = PR.ranked_candidates("l_orderkey", "bigint", ORDERS_COLS)
    assert cands[0] == ("o_orderkey", "bigint")
    assert len(cands) == len(ORDERS_COLS)


def test_confidence_scoring_layout():
    p = PR.render_confidence_scoring(
        "l_orderkey", "bigint", [("o_orderkey", "bigint"), ("o_custkey", "bigint")]
    )
    # chat wrap + system (reference's own "schema,predict" concatenation)
    assert p.startswith("<|im_start|>system\nAct as a schema matching expert.")
    assert "MCQ format of the schema,predict the likelihood" in p
    # lettered options with the None tail (PromptReprTemplate.py:492-499)
    assert "A-o_orderkey(bigint)\nB-o_custkey(bigint)\nC-None of the options" in p
    assert "input query:\nl_orderkey(bigint)\n\n" in p
    assert '"None of the options".\n\n' in p
    assert p.endswith("<|im_start|>assistant\n")


def test_logits_layout():
    p = PR.render_logits_confidence(
        "l_orderkey", "bigint", [("o_orderkey", "bigint"), ("o_custkey", "bigint")]
    )
    assert "Question: Target attributes:\n1. o_orderkey(bigint)\n2. o_custkey(bigint)" in p
    assert p.rstrip().endswith("Answer: <|im_end|>\n<|im_start|>assistant") or (
        "\n\nAnswer: " in p
    )
    # instruction block = attributes template desc only
    assert "`attribute name (data type)`.\n\n\n\nQuestion:" in p


def test_n2one_json_layout():
    p = PR.render_n2one_json(
        "tpch:ORDERS", ORDERS_COLS[:2], "tpch:LINEITEM", "l_orderkey", "bigint"
    )
    # str(dict)-style JSON with " quotes (PromptReprTemplate.py:330,400)
    assert (
        '{"relation name": "tpch:ORDERS", "columns": '
        '[{"name": "o_orderkey", "type": "bigint"}, '
        '{"name": "o_custkey", "type": "bigint"}]}'
    ) in p
    assert (
        '{"relation name": "tpch:LINEITEM", "column": '
        '{"name": "l_orderkey", "type": "bigint"}}'
    ) in p
    assert "including the name and type of all its attributes" in p
    # answer prefix appended after the generation header (PromptICLTemplate.py:175-176)
    assert p.endswith('<|im_start|>assistant\n\n{ "matches": [')


def test_cot_logits_layout():
    p = PR.render_cot_logits(
        "tpch:ORDERS", ORDERS_COLS[:2], "tpch:LINEITEM", "l_orderkey", "bigint"
    )
    assert "semantically best match to l_orderkey from tpch:LINEITEM." in p
    assert "`Best Match:<target attribute>`" in p
    assert p.endswith("<|im_start|>assistant\n")  # no answer prefix


def test_tada_is_not_chat_wrapped():
    p = PR.render_tada(
        "tpch:ORDERS", ORDERS_COLS[:1], "tpch:LINEITEM", "l_orderkey", "bigint"
    )
    assert "<|im_start|>" not in p  # BaselinePrompt: plain system\n\nintro
    assert p.startswith("Act as a schema matcher for relational schemas.")
    assert "Relation name: tpch:ORDERS\n\nIn the following, I will list all attributes of tpch:ORDERS.\n\n" in p
    assert "Attribute name: o_orderkey\nAttribute description: values of o_orderkey (bigint)\n" in p
    assert '`{"yes": [], "no": [], "unknown": []}`' in p


def test_mm_mcq_formatter_exact_literal():
    """Full-prompt literal for the smallest template — catches drift in the
    shared system constant that substring checks could miss."""
    got = PR.render_mm_mcq_formatter("Refined String List: ['c_name', 'c_acctbal']")
    expected = (
        "<|im_start|>system\n"
        "You are an expert MCQ formatter. Your task is to take a list of schema "
        "values and convert them into a multiple choice question format with "
        "(letter)Schema value, where the schema values should be key(description).\n"
        "—\n"
        "Follow the following format. \n"
        "Input: input list of schema values Mcq: MCQ format of schema values e.g "
        "(A)Schema value, (B)Schema value. Do not include additional options, only "
        "the schema values as options. where the schema values should be "
        "key(description). Add a No Match option.\n_\n"
        "<|im_end|>\n"
        "<|im_start|>user\n"
        "Input :  ['c_name', 'c_acctbal'] Mcq: <|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    assert got == expected
    assert PR.render_mm_mcq_formatter("no marker here") is None


def test_mm_refiner_and_evaluator_layout():
    p = PR.render_mm_refiner(
        "tpch:ORDERS", ORDERS_COLS[:2], "tpch:LINEITEM", "l_orderkey", "bigint"
    )
    assert "expert TPCH matching ranker" in p
    assert "basedon the input" in p  # reference's own concatenation quirk
    assert "Input Schema:\n['tpch:ORDERS-o_orderkey(bigint)', 'tpch:ORDERS-o_custkey(bigint)']" in p
    assert "Input Query:\ntpch:LINEITEM-l_orderkey(bigint)\n" in p
    assert "Reasoning: Let’s think step by step in order to" in p

    e = PR.render_mm_evaluator("tpch:LINEITEM", "l_orderkey", ["o_orderkey", "o_custkey"])
    assert "Query: tpch:LINEITEM-l_orderkey\nAnswers: ['o_orderkey', 'o_custkey']\n" in e
    assert e is not None and PR.render_mm_evaluator("t", "a", []) is None


def test_mm_confidence_split_semantics():
    # options run from the FIRST "(A)" to the next occurrence — python
    # split()[1] semantics (MatchMaker.py:233-236)
    p = PR.render_mm_confidence("tpch:LINEITEM", "l_orderkey", "bigint",
                                "intro (A)x\n(B)y tail")
    assert "Input Mcq:\n(A)x\n(B)y tail\nInput Query:\n" in p
    assert "l_orderkey(bigint)Relation:\n" in p  # no newline before Relation:
    assert PR.render_mm_confidence("t", "a", "int", "no block") is None


def test_validate_mm_candidates_and_formatting():
    opts = ["s-a(int)", "s-b(int)"]
    assert PR.validate_mm_candidates("Refined String List: ['s-a(int)']", opts) == ["s-a(int)"]
    assert PR.validate_mm_candidates("['s-a(int)', 's-b(int)']", opts) == ["s-a(int)", "s-b(int)"]
    assert PR.validate_mm_candidates("['zzz']", opts) is None  # out of universe
    six = "['s-a(int)', 's-a(int)', 's-a(int)', 's-a(int)', 's-a(int)', 's-a(int)']"
    assert PR.validate_mm_candidates(six, opts) is None  # >5 cap
    assert PR.validate_mm_candidates("not a list", opts) is None
    assert PR.formatted_options(["x", "y"]) == "(A)x\n(B)y\n(C)No Match."


def test_pack_icl_examples_skip_and_continue():
    """The reference packing loop SKIPS a too-big example and keeps
    scanning (PromptICLTemplate.py:210-217) — it does not stop at the first
    overflow."""
    big = ("w " * 60).strip()  # 60 tokens
    small = "a b c"  # 3 tokens
    demos = [("u1 u2", big), ("u3 u4", small), ("u5 u6", small)]
    # base 10 + ans 5, budget 30: first demo costs 62 (skip), next two cost
    # 5 each (both fit)
    picked = PR.pack_icl_examples(demos, base_tokens=10, k=2, max_seq_len=30, max_ans_len=5)
    assert picked == [("u3 u4", small), ("u5 u6", small)]
    # k binds before the pool runs out
    picked = PR.pack_icl_examples(demos[1:], 10, k=1, max_seq_len=100, max_ans_len=5)
    assert picked == [("u3 u4", small)]
    # nothing fits
    assert PR.pack_icl_examples(demos, 10, 2, 12, 5) == []


def test_render_icl_prompt_message_order():
    n, p = PR.render_icl_prompt(
        "SYS", "TARGET", [("EX_U", "EX_A")], k=1, max_seq_len=1000, max_ans_len=0
    )
    assert n == 1
    assert p == (
        "<|im_start|>system\nSYS<|im_end|>\n"
        "<|im_start|>user\nEX_U<|im_end|>\n"
        "<|im_start|>assistant\nEX_A<|im_end|>\n"
        "<|im_start|>user\nTARGET<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


def test_icl_budget_truncates(spark):
    """The tight config must pack fewer shots than k; the generous one
    packs exactly k — over the live query output."""
    from scalable_data_integration_with_llms_spark.queries import QUERIES

    rows = QUERIES["q_icl_prompt_render"](spark, SF_DIR).collect()
    by_cfg = {}
    for r in rows:
        by_cfg.setdefault(r.config, set()).add(r.n_examples)
    assert by_cfg["k2_seq1024"] == {2}
    assert by_cfg["k2_seq190"] == {1}


try:
    from hypothesis import given, settings, strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False


if _HAVE_HYP:

    _demo = st.tuples(
        st.text(alphabet="ab ", min_size=0, max_size=30),
        st.text(alphabet="xy ", min_size=0, max_size=30),
    )

    @settings(max_examples=200, deadline=None)
    @given(
        demos=st.lists(_demo, max_size=12),
        base=st.integers(0, 200),
        k=st.integers(0, 5),
        max_seq=st.integers(0, 400),
        max_ans=st.integers(0, 100),
    )
    def test_pack_icl_properties(demos, base, k, max_seq, max_ans):
        picked = PR.pack_icl_examples(demos, base, k, max_seq, max_ans)
        # never more than k; picked is an order-preserving subsequence
        assert len(picked) <= k
        it = iter(demos)
        assert all(any(p == d for d in it) for p in picked)
        # every accepted example fit at its acceptance point, so the final
        # total plus the answer reservation is within budget when non-empty
        total = base + sum(PR.ws_tokens(u) + PR.ws_tokens(a) for u, a in picked)
        if picked:
            assert total + max_ans <= max_seq
        # exact greedy semantics: replay the reference loop
        replay, toks = [], base
        for d in demos:
            if len(replay) >= k:
                break
            cost = PR.ws_tokens(d[0]) + PR.ws_tokens(d[1])
            if toks + cost + max_ans <= max_seq:
                replay.append(d)
                toks += cost
        assert picked == replay

    @settings(max_examples=100, deadline=None)
    @given(
        opts=st.lists(st.text(alphabet="abc-()", min_size=1, max_size=8), min_size=1, max_size=6, unique=True),
        take=st.integers(0, 8),
    )
    def test_validate_mm_candidates_properties(opts, take):
        subset = opts[:take]
        text = "Refined String List: " + str(subset)
        got = PR.validate_mm_candidates(text, opts)
        if len(subset) > 5:
            assert got is None  # the cap
        else:
            assert got == subset
        # an out-of-universe item always rejects
        assert PR.validate_mm_candidates(str(subset + ["@@not-an-option@@"]), opts) is None


def test_mapping_prompt_serializer_layout():
    """JSON schema serializer (Schema Mapping PromptBuilder.py:130-197):
    OrderedDict key order, str(bool) nullable, conditional hint keys,
    seeded shuffle ordering."""
    from scalable_data_integration_with_llms_spark.functions import mapping_prompts as MP

    rel = {
        "name": "t",
        "attributes": [
            ("pk_id", "bigint", "the key", True, False),
            ("val", "double", "", False, True),
        ],
        "foreign_keys": [(("val",), "other", ("o_val",))],
    }
    out = MP.serialize_schema_json([rel], seed=1)
    parsed = json.loads(out)
    assert list(parsed[0].keys()) == ["relation", "attributes", "primary key", "foreign keys"]
    by_name = {a["name"]: a for a in parsed[0]["attributes"]}
    assert by_name["pk_id"] == {
        "name": "pk_id", "type": "bigint", "nullable": "False", "description": "the key"
    }
    assert by_name["val"] == {"name": "val", "type": "double", "nullable": "True"}
    assert parsed[0]["primary key"] == ["pk_id"]
    assert parsed[0]["foreign keys"] == [
        {"from_attributes": ["val"], "to_relation": "other", "to_attributes": ["o_val"]}
    ]
    # attribute order follows the seeded shuffle key, not declaration
    names = [a["name"] for a in parsed[0]["attributes"]]
    assert names == sorted(names, key=lambda n: MP.shuffle_key(1, n))


if _HAVE_HYP:

    _ident = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12
    )

    @settings(max_examples=100, deadline=None)
    @given(
        names=st.lists(_ident, min_size=1, max_size=6, unique=True),
        seed=st.integers(0, 10_000),
        pk_mask=st.lists(st.booleans(), min_size=6, max_size=6),
        null_mask=st.lists(st.booleans(), min_size=6, max_size=6),
    )
    def test_serializer_roundtrip_properties(names, seed, pk_mask, null_mask):
        """serialize_schema_json always emits parseable JSON whose structure
        round-trips: attribute set preserved, order = shuffle-key order,
        primary key = declared-order pk subset, nullable = str(bool)."""
        from scalable_data_integration_with_llms_spark.functions import (
            mapping_prompts as MP,
        )

        attrs = [
            (n, "varchar(9)", f"col {n}", pk_mask[i], null_mask[i])
            for i, n in enumerate(names)
        ]
        rel = {"name": "rel_x", "attributes": attrs, "foreign_keys": []}
        parsed = json.loads(MP.serialize_schema_json([rel], seed))
        assert [list(p.keys()) for p in parsed] == [
            ["relation", "attributes", "primary key"]
        ]
        got = parsed[0]["attributes"]
        assert {a["name"] for a in got} == set(names)
        order = [a["name"] for a in got]
        assert order == sorted(order, key=lambda n: MP.shuffle_key(seed, n))
        assert parsed[0]["primary key"] == [n for n, *_r in attrs if _r[2]]
        for a in got:
            i = names.index(a["name"])
            assert a["nullable"] == str(bool(null_mask[i]))
            assert a["description"] == f"col {a['name']}"


def test_mapping_prompt_render_spark_matches_golden(spark):
    from scalable_data_integration_with_llms_spark.queries import QUERIES
    from scalable_data_integration_with_llms_spark.queries.prompt_q import (
        _golden_mapping_prompts,
    )

    golden = {t: (s, u) for t, s, u in _golden_mapping_prompts()}
    rows = QUERIES["q_mapping_prompt_render"](spark, SF_DIR).collect()
    assert len(rows) == len(golden) == 5
    for r in rows:
        assert (r.system_prompt, r.user_prompt) == golden[r.template], r.template
    # every template embeds both serialized namespaces
    any_user = rows[0].user_prompt
    assert '"relation": "orders"' in any_user and '"relation": "big_orders"' in any_user
    assert '"foreign keys": [{"from_attributes": ["o_custkey"]' in any_user


def test_example_selectors(spark):
    """Both selector queries pick exactly k demos per target, never the
    target itself (ExampleSelectorTemplate.py:107-150)."""
    from scalable_data_integration_with_llms_spark.queries import QUERIES
    from scalable_data_integration_with_llms_spark.queries.prompt_q import _SELECTOR_K

    for name in ("q_example_selector_random", "q_example_selector_coverage"):
        rows = QUERIES[name](spark, SF_DIR).collect()
        per_target: dict[str, list] = {}
        for r in rows:
            assert r.demo_case_id != r.case_id
            per_target.setdefault(r.case_id, []).append(r.pick_rank)
        assert all(sorted(v) == list(range(1, _SELECTOR_K + 1)) for v in per_target.values())
        assert len(per_target) == 4  # every case is a target

    # the random draw is seed-deterministic: same result twice
    a = sorted(map(tuple, QUERIES["q_example_selector_random"](spark, SF_DIR).collect()))
    b = sorted(map(tuple, QUERIES["q_example_selector_random"](spark, SF_DIR).collect()))
    assert a == b


@pytest.mark.parametrize("name", [
    "q_repr_scoring_prompts", "q_repr_n2one_prompts", "q_repr_tada_prompts",
    "q_mm_prompts", "q_repr_prompt_tokens", "q_icl_prompt_render",
])
def test_spark_matches_golden(spark, name):
    """Distributed assembly == sequential golden renderer, byte-for-byte
    (the same comparison the driver's oracle makes, kept here so template
    edits fail fast in pytest)."""
    from scalable_data_integration_with_llms_spark.queries import QUERIES
    from scalable_data_integration_with_llms_spark.queries import prompt_q as Q

    golden = {
        "q_repr_scoring_prompts": lambda: {
            (t, c, a): p for t, c, a, p in Q._golden_scoring()
        },
        "q_repr_n2one_prompts": lambda: {
            (t, c, a): p for t, c, a, p in Q._golden_n2one()
        },
        "q_repr_tada_prompts": lambda: {(c, a): p for c, a, p in Q._golden_tada()},
        "q_mm_prompts": lambda: {
            (t, c, a, i): p for t, c, a, i, p in Q._golden_mm()
        },
        "q_repr_prompt_tokens": lambda: {
            (t, c): (n, tok) for t, c, n, tok in Q._golden_tokens()
        },
        "q_icl_prompt_render": lambda: {
            (cfg, m, c, a): (n, p) for cfg, m, c, a, n, p in Q._golden_icl()
        },
    }[name]()
    rows = QUERIES[name](spark, SF_DIR).collect()
    assert len(rows) == len(golden)
    for r in rows:
        d = r.asDict()
        if name == "q_repr_prompt_tokens":
            key = (d["repr_type"], d["case_id"])
            assert (d["n_prompts"], d["prompt_tokens"]) == golden[key], key
        elif name == "q_icl_prompt_render":
            key = (d["config"], d["max_seq_len"], d["case_id"], d["query_attr"])
            assert (d["n_examples"], d["prompt"]) == golden[key], key
        else:
            key = tuple(d[k] for k in d if k != "prompt")
            assert d["prompt"] == golden[key], key


def test_question_cost_report(spark):
    """Cost-report rollup == the sequential twin, and the twin itself
    satisfies the reference's arithmetic (generate_question.py:185-188,
    236-244): token_cnt = sum/n, tokens-per-question re-divides the mean,
    n_total_tokens adds the mean to n*max_ans_len."""
    from scalable_data_integration_with_llms_spark.queries import QUERIES
    from scalable_data_integration_with_llms_spark.queries import prompt_q as Q

    golden = {r[0]: r[1:] for r in Q._golden_cost_report()}
    rows = QUERIES["q_question_cost_report"](spark, SF_DIR).collect()
    assert len(rows) == len(golden) == len(Q.ICL_CONFIGS)
    assert {r.config for r in rows} == set(golden)
    for r in rows:
        n, total, mean_m, per_q_m, total_m, e0, e1, e2 = golden[r.config]
        assert (
            r.n_questions, r.sum_prompt_tokens, r.token_cnt_milli,
            r.tokens_per_q_milli, r.n_total_tokens_milli,
            r.exp_count_0, r.exp_count_1, r.exp_count_2,
        ) == golden[r.config], r.config
        # reference arithmetic relations, independently of the twin
        assert mean_m == 1000 * total // n
        assert per_q_m == 1000 * total // (n * n)
        assert total_m == n * Q._ICL_MAX_ANS_LEN * 1000 + mean_m
        assert e0 + e1 + e2 == n
