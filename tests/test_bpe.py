"""Vendored BPE tokenizer (functions/bpe.py) + chat template (functions/chat.py).

Covers the merge algorithm's public semantics (rank-ordered merges,
left-to-right non-overlapping replacement), training determinism, the
committed fixture's self-consistency, distributed parity (pandas UDF ==
pure-Python), and the ChatML render (reference ``apply_chat_template``
contract, PromptICLTemplate.py:86-95).
"""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SDI_TEST_SF_DIR", "/root/testdata/sf0.001")

from scalable_data_integration_with_llms_spark.functions.bpe import (
    encode_text,
    encode_word,
    merge_all,
    ranks_of,
    train_bpe,
    train_bpe_distributed,
)
from scalable_data_integration_with_llms_spark.functions.bpe_merges import MERGES, WORD_TOKEN_COUNTS
from scalable_data_integration_with_llms_spark.functions.chat import apply_chat_template, chat_prompt


def test_merge_all_non_overlapping():
    # GPT-2 semantics: 'aaa' with (a,a) merges the LEFT pair only
    assert merge_all(("a", "a", "a"), ("a", "a")) == ("aa", "a")
    assert merge_all(("a", "a", "a", "a"), ("a", "a")) == ("aa", "aa")
    assert merge_all(("x", "y"), ("a", "b")) == ("x", "y")


def test_encode_word_rank_order():
    # rank 0 (a,b) applies before rank 1 (b,c) even though both are present
    ranks = ranks_of([("a", "b"), ("b", "c"), ("ab", "c")])
    assert encode_word("abc", ranks) == ("abc",)  # ab first, then ab+c
    # with only (b,c) available the other path is taken
    assert encode_word("abc", ranks_of([("b", "c")])) == ("a", "bc")


def test_encode_round_trip_and_bounds():
    ranks = ranks_of(MERGES)
    for w in WORD_TOKEN_COUNTS:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w  # merges never lose characters
        assert 1 <= len(toks) <= len(w)
        assert len(toks) == WORD_TOKEN_COUNTS[w]  # fixture self-consistent


def test_train_deterministic_and_useful():
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    m1 = train_bpe(freqs, 10)
    m2 = train_bpe(dict(reversed(list(freqs.items()))), 10)
    assert m1 == m2  # insertion order of the freq table is irrelevant
    # classic example: 'es'/'est' family dominates (Sennrich et al. 2016)
    assert ("e", "s") in m1 or ("s", "t") in m1
    ranks = ranks_of(m1)
    assert len(encode_word("newest", ranks)) < len("newest")


def test_train_min_freq_stops():
    # every pair unique -> nothing reaches min_freq=2
    assert train_bpe({"abcd": 1}, 10, min_freq=2) == []


@given(st.lists(st.text(alphabet="abcde", min_size=1, max_size=8), min_size=1, max_size=6))
@settings(max_examples=50, deadline=None)
def test_encode_text_property(words):
    ranks = ranks_of(train_bpe({w: 3 for w in words}, 8))
    text = " ".join(words)
    n = encode_text(text, ranks)
    # bounded by character count and at least one token per word
    assert len(words) <= n <= sum(len(w) for w in words)


def test_udf_parity_with_pure_python(spark):
    from scalable_data_integration_with_llms_spark.functions.bpe import bpe_token_count_udf

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    got = {
        r["doc_id"]: r["n"]
        for r in d.select("doc_id", bpe_token_count_udf(MERGES)("text").alias("n")).collect()
    }
    ranks = ranks_of(MERGES)
    want = {r["doc_id"]: encode_text(r["text"], ranks) for r in d.collect()}
    assert got == want


def test_distributed_training_matches_fixture(spark):
    # sf0.001 shares the 31-word vocabulary; training there must agree with
    # local training on the same frequencies (determinism), though not
    # necessarily with the sf0.01-trained fixture.
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges = train_bpe_distributed(d, "text", n_merges=30, min_freq=2)
    freqs = {
        r["w"]: r["c"]
        for r in d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert merges == train_bpe(freqs, 30, min_freq=2)


def test_chat_template_format():
    msgs = [
        {"role": "system", "content": "Be terse."},
        {"role": "user", "content": "Match a to b?"},
    ]
    s = apply_chat_template(msgs)
    assert s == (
        "<|im_start|>system\nBe terse.<|im_end|>\n"
        "<|im_start|>user\nMatch a to b?<|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    assert apply_chat_template(msgs, add_generation_prompt=False).endswith("<|im_end|>\n")


def test_chat_prompt_column_parity(spark):
    df = spark.createDataFrame([("Be terse.", "Match a to b?")], "sys string, usr string")
    got = df.select(chat_prompt(F.col("sys"), F.col("usr")).alias("p")).first()["p"]
    want = apply_chat_template(
        [{"role": "system", "content": "Be terse."}, {"role": "user", "content": "Match a to b?"}]
    )
    assert got == want


def test_word_frequencies_vocab_cap_bounds_collect(spark):
    """The trainer's driver-memory contract: with max_vocab set, the collect
    is bounded at V rows, selected by (freq desc, word asc) via
    TakeOrderedAndProject — never a global sort of the word table."""
    from scalable_data_integration_with_llms_spark.functions.bpe import word_frequencies
    from scalable_data_integration_with_llms_spark.sources.readers import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    capped = word_frequencies(d, "text", max_vocab=10)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = capped.collect()
    assert len(rows) <= 10
    # deterministic order: frequencies non-increasing, words ascending on ties
    freqs = [(r["freq"], r["word"]) for r in rows]
    assert freqs == sorted(freqs, key=lambda t: (-t[0], t[1]))


def test_train_bpe_distributed_cap_preserves_fixture_merges(spark):
    """At the committed training sf the vocabulary sits far below the cap,
    so capped and uncapped training must agree (the fixture contract)."""
    from scalable_data_integration_with_llms_spark.functions.bpe import (
        train_bpe_distributed,
        word_frequencies,
    )
    from scalable_data_integration_with_llms_spark.sources.readers import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    n_vocab = word_frequencies(d, "text").count()
    assert n_vocab < 65_536  # the cap is headroom here, not a semantic change
    assert train_bpe_distributed(d, "text", n_merges=10) == train_bpe_distributed(
        d, "text", n_merges=10, max_vocab=n_vocab
    )
