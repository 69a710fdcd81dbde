"""U1 integration evidence: the real ``llm_map`` boundary against a real
(localhost) HTTP inference service (VERDICT r9 task #5).

The reference's generation path is an external batched HTTP/torch call with
retry-forever (``LLM/llm_classes.py:95-143``); the engine's contract keeps
inference external (BASELINE.json) and bounds retries
(``llm/boundary.py:llm_map``).  Until r9 that path was pytest-only — the
request_fn was an in-process lambda, so the executor→service hop, the
transport-error retry, and the backoff never executed end-to-end.

``q_llm_boundary_http`` closes that gap without violating the external-
inference boundary: a stdlib ``http.server`` mock (daemon thread, ephemeral
port) serves a DETERMINISTIC "model" — md5 + length of the prompt text — and
FAILS the first two requests per process with 503, so the batched POST from
the Arrow workers must exercise the bounded-backoff retry loop before the
query can complete.  The output is pure SQL-expressible (DuckDB ``md5``/
``length``), giving U1 a full value oracle:

* one POST per input partition (4 partitions → 4 requests — the reference's
  DataLoader batching, ``ask_LLM.py:144-145``, re-expressed as Arrow batch =
  request batch);
* HTTP 503 → ``urllib`` raises → ``llm_map`` backs off and retries the batch
  WITHOUT recomputing upstream (the iterator replays the same pdf);
* workers are separate OS processes reaching the service over TCP — the same
  topology as executors calling an inference sidecar at cluster scale.
"""

from __future__ import annotations

import hashlib
import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm.boundary import llm_map
from ..sources.readers import load_table
from .registry import query

_N_DOCS = 24  # small fixed slice: the point is the boundary, not throughput
_FAIL_FIRST = 2  # 503s served before the mock turns healthy (per process)

# (server, port, stats) memoized per driver process — queries() callables are
# invoked repeatedly (sweeps, bench medians); one service instance serves all
_STATE: dict[str, object] = {}
_LOCK = threading.Lock()


class _MockInferenceHandler(BaseHTTPRequestHandler):
    """POST /score: json [{doc_id, text}] → [{doc_id, text_md5, n_chars}];
    the first ``_FAIL_FIRST`` requests per process 503 (transient-failure
    injection for the retry path)."""

    def do_POST(self):  # noqa: N802 (stdlib handler naming)
        srv = self.server
        with srv.state_lock:
            srv.stats["requests"] += 1
            if srv.stats["fail_budget"] > 0:
                srv.stats["fail_budget"] -= 1
                self.send_response(503)
                self.end_headers()
                return
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        docs = json.loads(body)
        out = [
            {
                "doc_id": d["doc_id"],
                "text_md5": hashlib.md5(d["text"].encode("utf-8")).hexdigest(),
                "n_chars": len(d["text"]),
            }
            for d in docs
        ]
        payload = json.dumps(out).encode("utf-8")
        with srv.state_lock:
            srv.stats["served"] += 1
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # keep sweep output clean
        pass


def ensure_mock_service() -> tuple[int, dict]:
    """Start (once per process) the localhost mock inference service; return
    (port, stats).  Daemon thread + ephemeral port: nothing to clean up, no
    fixed-port collisions across parallel sweeps."""
    with _LOCK:
        if "port" not in _STATE:
            srv = ThreadingHTTPServer(("127.0.0.1", 0), _MockInferenceHandler)
            srv.state_lock = threading.Lock()
            srv.stats = {"requests": 0, "served": 0, "fail_budget": _FAIL_FIRST}
            threading.Thread(target=srv.serve_forever, daemon=True).start()
            _STATE["port"] = srv.server_address[1]
            _STATE["stats"] = srv.stats
            _STATE["state_lock"] = srv.state_lock
        return _STATE["port"], _STATE["stats"]  # type: ignore[return-value]


def http_score_request_fn(port: int):
    """The ``request_fn`` shipped to executors: one POST per Arrow batch.
    Plain function-returning-closure so the pickled payload carries only the
    port number, not the server object."""

    def request_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        payload = json.dumps(
            [
                {"doc_id": int(i), "text": t}
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
        ).encode("utf-8")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score",
            data=payload,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:  # 503 raises
            data = json.loads(resp.read())
        return pd.DataFrame(
            data, columns=["doc_id", "text_md5", "n_chars"]
        ).astype({"doc_id": "int64", "n_chars": "int64"})

    return request_fn


_HTTP_ORACLE = f"""
SELECT doc_id,
       md5(text) AS text_md5,
       length(text) AS n_chars
FROM documents
WHERE doc_id < {_N_DOCS}
"""


@query("q_llm_boundary_http", _HTTP_ORACLE)
def q_llm_boundary_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 end-to-end: documents slice → repartition(4) (4 request batches)
    → ``llm_map`` POSTs to the localhost mock → first two requests 503 →
    bounded-backoff retry → deterministic scores, full DuckDB oracle.

    The fail budget RE-ARMS on every invocation (r10 verdict observation:
    a per-process budget meant only the first invocation in a sweep
    exercised the 503-retry path; now every repetition does — later
    ``collect()``s of the SAME returned frame still take the healthy path,
    which is fine: the retry leg is per-invocation evidence, not
    per-action)."""
    port, stats = ensure_mock_service()
    with _STATE["state_lock"]:  # the handler's own lock, not the module's
        stats["fail_budget"] = _FAIL_FIRST
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _N_DOCS)
        .select("doc_id", "text")
        .repartition(4, "doc_id")
    )
    return llm_map(
        docs,
        http_score_request_fn(port),
        "doc_id bigint, text_md5 string, n_chars bigint",
        max_retries=6,
        base_backoff_s=0.05,
    )
