"""Text-analysis functions for training-data pipelines (BASELINE.json north
star: language-ID, quality scoring, token counting, fingerprinting).

All JVM-side column expressions (whole-stage codegen); the n-gram heuristics
use md5-stable arithmetic so every score is oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword marker lists for the language-ID heuristic.  A real pipeline ships
# per-language n-gram profiles; the heuristic structure (per-language marker
# hit counts → argmax) is what matters and is identical at any scale.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "a", "is"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["的", "是", "了", "在", "我"],
}


def token_count(text: Column | str) -> Column:
    """Whitespace token count (U4's tokenizer-free budget proxy)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(F.size(F.split(c, " ")))


def word_tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def marker_hits(text: Column | str, markers: list[str]) -> Column:
    """Number of tokens that are language markers — exact integer count via
    array intersection over the token list."""
    toks = word_tokens(text)
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def marker_hits_all(text: Column | str, markers: dict[str, list[str]]) -> Column:
    """All languages' marker hit counts in ONE pass over the token array:
    ``aggregate`` with a struct accumulator (one int field per language).
    The fused form traverses and splits the text once instead of once per
    language — same exact counts as ``marker_hits``, ~#languages× less
    array work (still whole-stage codegen, no shuffle, no Python)."""
    toks = word_tokens(text)
    langs = list(markers)
    init = F.struct(*[F.lit(0).alias(lang) for lang in langs])

    def step(acc: Column, t: Column) -> Column:
        return F.struct(
            *[
                (acc[lang] + F.when(t.isin(*markers[lang]), 1).otherwise(0)).alias(lang)
                for lang in langs
            ]
        )

    return F.aggregate(toks, init, step)


def quality_features(text: Column | str) -> dict[str, Column]:
    """Quality-scoring features: token count, char count, mean word length,
    distinct-token ratio, stopword ratio.  Ratios are exact int/int
    divisions."""
    c = F.col(text) if isinstance(text, str) else text
    toks = word_tokens(c)
    n_toks = token_count(c)
    n_chars = F.length(c)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = marker_hits(c, LANG_MARKERS["en"])
    return {
        "n_tokens": n_toks,
        "n_chars": n_chars,
        # chars excluding separators / tokens — same formula both engines
        "mean_word_len": (n_chars - (n_toks - 1)) / n_toks,
        "distinct_ratio": n_distinct / n_toks,
        "stopword_ratio": n_stop / n_toks,
    }


# GPT-2-style pre-tokenizer pattern, restricted to constructs that parse
# identically in Java regex (Spark) and RE2 (DuckDB): contraction suffixes,
# space-prefixed letter runs, digit runs, and other-symbol runs.  No
# lookahead (RE2 has none) and no \p classes (byte/codepoint drift).
BPE_ISH_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-style pre-tokenization (U4's second budget proxy): splits into
    word/number/symbol/contraction pieces the way GPT-2's pre-tokenizer
    does, entirely JVM-side via ``regexp_extract_all``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(text: Column | str) -> Column:
    return F.size(bpe_ish_tokens(text))


def hf_token_count(model_name: str = "gpt2"):
    """U4 real path: a pandas UDF counting tokens with a HuggingFace
    tokenizer broadcast per executor (``PromptICLTemplate.py:24-25``).
    Gated behind an import-try — this container has no ``transformers``;
    callers fall back to ``token_count`` (the whitespace proxy)."""
    try:
        from transformers import AutoTokenizer  # noqa: F401
    except ImportError:
        return None

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _count(texts: pd.Series) -> pd.Series:
        tok = AutoTokenizer.from_pretrained(model_name)
        return texts.map(lambda s: len(tok.encode(s)))

    return _count


def fingerprint(text: Column | str, prefix_len: int = 16) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized text (first
    ``prefix_len`` hex chars) — the rolling-hash stand-in, identical in any
    engine."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.regexp_replace(F.lower(c), " +", " ")
    return F.substring(F.md5(norm), 1, prefix_len)


def ngram_structs(words: Column, n: int) -> Column:
    """Array of n-gram structs (fields "0".."n-1") via ``arrays_zip`` of n
    shifted slices — the CODEGEN-friendly n-gram builder.

    The ``transform(gram_indices(...), i -> concat_ws(slice(...)))`` idiom
    evaluates through interpreted higher-order-function lambdas (HOFs are
    CodegenFallback) and re-slices the token array per element; zipped
    slices + a row-level ``concat_ws`` after ``explode`` run inside
    whole-stage codegen.  Measured at sf0.1: a bigram explode+count pass
    dropped 1.59 s → 0.27 s (6×), the 3-gram shingle array (with map-side
    ``array_distinct``) 0.33 s → 0.15 s.  Short documents (< n tokens)
    yield an empty array — slice length is clamped at 0, so no row ever
    crashes the slice (the gram_indices contract, preserved)."""
    sz = F.size(words)
    length = F.greatest(sz - (n - 1), F.lit(0))
    return F.arrays_zip(*[F.slice(words, k + 1, length) for k in range(n)])


def ngram_strings(words: Column, n: int) -> Column:
    """Array of space-joined n-gram strings — ``ngram_structs`` plus one
    concat per element.  Still one HOF pass (consumers that need an ARRAY,
    e.g. for map-side ``array_distinct``, can't avoid it), but without the
    per-element re-slicing of the gram_indices idiom — ~2× cheaper at
    sf0.1.  Consumers that explode anyway should explode
    ``ngram_structs`` and concat row-level instead (fully codegen)."""
    zipped = ngram_structs(words, n)
    return F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)])
    )


def gram_indices(words: Column, n: int) -> Column:
    """0-based start indices of the n-grams of ``words`` — EMPTY when the
    document has fewer than n tokens.  The bare
    ``sequence(0, greatest(size - n, -1))`` idiom DESCENDS to [0, -1] for a
    short document (Spark picks step -1 when start > stop), and a 0 start
    index then crashes slice/element_at at runtime — one 1-token document
    would kill a whole corpus query."""
    return F.when(
        F.size(words) >= n, F.sequence(F.lit(0), F.size(words) - n)
    ).otherwise(F.array().cast("array<int>"))
