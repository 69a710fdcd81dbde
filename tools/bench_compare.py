#!/usr/bin/env python
"""Bench regression gate: run bench.py and compare per-query wall times to a
baseline (default: the committed full battery BENCH_FULL.json — the driver
line rotates its reported subset per round, so BENCH_r{N}.json files from
different rounds share few or no query names; the full battery always
covers everything).

    python tools/bench_compare.py [--baseline BENCH_r01.json] [--threshold 2.0]

The current run's numbers come from the full battery bench.py writes to
BENCH_FULL_last_run.json, not the subset stdout line.

Noise-aware flagging (mechanized in round 7 — VERDICT r6 item 2): when the
baseline carries the median-of-N run metadata bench.py emits under
``runs``/``queries_runs``, a query is flagged only when its delta exceeds
the HOST'S OWN measured spread for that query (max/min across the baseline
battery runs, times a 1.5 safety margin), never below the --threshold
floor.  This replaces the eyeballed "is 1.2x the VM or the code?" call the
round-6 SCALE.md control experiment made in prose.  Exit 1 if any query
regressed beyond its effective threshold.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPREAD_MARGIN = 1.5  # flag only beyond 1.5x the measured per-query spread


def load_baseline(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc:
        doc = doc["parsed"]
    return doc


def drift_ratio(base_doc: dict, now_doc: dict) -> float | None:
    """Host-drift ratio from the two batteries' fixed-work calibration rows,
    or None when no usable anchor exists — callers then fall back to raw
    ratios.  Prefers the MULTI-core anchor (`calibration_mt`, round 13)
    when both batteries carry it: the battery's queries saturate every
    core, and r13 measured single-core and multi-core speed drifting
    independently on this shared VM (0.65x vs ~1.15x the same hour), so
    the single-slice anchor can amplify rather than remove host noise.
    Falls back to the single-core `calibration` row for pre-r13 baselines.
    A zero/absent sec is treated as missing, never as a divide-by-zero.
    The two calibrations must describe the SAME fixed work (the `work`
    string): dividing seconds measured over different anchor loads would
    silently normalize every ratio by a bogus ~Nx drift (ADVICE r12), so a
    mismatch also returns None, with a warning.

    Returns ``(ratio, anchor_key)`` — the key names which anchor produced
    the ratio, so the caller's footer can never disagree with the ratio it
    describes (ADVICE r13: the selection logic used to be duplicated
    between here and the footer)."""
    for key in ("calibration_mt", "calibration"):
        base = base_doc.get(key) or {}
        now = now_doc.get(key) or {}
        base_cal = base.get("sec") or None
        now_cal = now.get("sec") or None
        if not (base_cal and now_cal):
            continue
        if base.get("work") != now.get("work"):
            print(
                f"WARNING: {key} work mismatch (baseline {base.get('work')!r}"
                f" vs now {now.get('work')!r}) — this anchor unusable",
                file=sys.stderr,
            )
            continue
        return now_cal / base_cal, key
    return None, None


def effective_threshold(
    name: str,
    floor: float,
    base_runs: dict[str, list[float]],
    host_spread: float | None,
    margin: float = SPREAD_MARGIN,
) -> float:
    """The flagging ratio for one query: the floor, raised to the measured
    noise envelope when the baseline carries one.  Per-query run spread
    when available; the battery-total spread otherwise."""
    t = floor
    runs = base_runs.get(name)
    if runs and min(runs) > 0:
        t = max(t, (max(runs) / min(runs)) * margin)
    elif host_spread:
        t = max(t, host_spread * margin)
    return t


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", default=None)
    ap.add_argument("--threshold", type=float, default=2.0,
                    help="floor ratio; per-query spread can only raise it")
    ap.add_argument("--no-run", action="store_true",
                    help="compare an existing BENCH_FULL_last_run.json "
                         "instead of re-running bench.py")
    ap.add_argument("--no-recheck", action="store_true",
                    help="skip the fresh-process re-measurement of flagged "
                         "rows (the default recheck exists because two "
                         "consecutive rounds of flags were shared-JVM heap "
                         "carryover, not code regressions)")
    args = ap.parse_args()

    baseline_path = args.baseline
    if baseline_path is None:
        full = os.path.join(ROOT, "BENCH_FULL.json")
        if os.path.exists(full):
            baseline_path = full
        else:
            candidates = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
            if not candidates:
                print("no BENCH_FULL.json / BENCH_r*.json baseline found")
                return 1
            baseline_path = candidates[-1]
    doc = load_baseline(baseline_path)
    base = doc["queries"]
    base_runs = doc.get("queries_runs") or {}
    host_spread = (doc.get("runs") or {}).get("spread")

    if not args.no_run:
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            capture_output=True, text=True, check=True, cwd=ROOT,
        )
    # bench.py honors SPARK_GRAFT_BENCH_OUT; read the same path it writes
    out_name = os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL_last_run.json")
    out_path = os.path.join(ROOT, out_name)
    if not os.path.exists(out_path):
        print(f"{out_name} not found — run bench.py first"
              + (" (invoked with --no-run, so nothing was benched)" if args.no_run else ""))
        return 1
    with open(out_path) as f:
        now_doc = json.load(f)
    now = now_doc["queries"]

    # Drift anchor (VERDICT r10 task #7): when BOTH batteries carry the
    # fixed-work JVM calibration row bench.py measures, their ratio is the
    # host's own speed change — divide it out of every per-query ratio so
    # a uniform shared-VM slowdown (the r9 watch-list postmortem) never
    # reads as regression, and a real regression still shows through on a
    # drifted host.  Flagging uses the NORMALIZED ratio when the anchor
    # exists, the raw ratio otherwise.
    drift, anchor_key = drift_ratio(doc, now_doc)
    base_cal = ((doc.get(anchor_key) or {}).get("sec")) if anchor_key else None
    now_cal = ((now_doc.get(anchor_key) or {}).get("sec")) if anchor_key else None

    regressed = []
    hdr_norm = f"{'norm':>8}" if drift else ""
    print(f"{'query':<28}{'base':>8}{'now':>8}{'ratio':>8}{hdr_norm}{'gate':>7}")
    for name, t in now.items():
        b = base.get(name)
        ratio = (t / b) if b else float("nan")
        norm = (ratio / drift) if (b and drift) else ratio
        gate = (
            effective_threshold(name, args.threshold, base_runs, host_spread)
            if b
            else float("nan")
        )
        flag = ""
        if b and norm > gate:
            regressed.append((name, b, t, gate))
            flag = "  << REGRESSED"
        if b is None:
            flag = "  (new)"
        norm_col = f"{norm:>8.2f}" if drift else ""
        print(f"{name:<28}{b if b else 0:>8.2f}{t:>8.2f}{ratio:>8.2f}{norm_col}{gate:>7.2f}{flag}")
    if drift:
        print(f"\nhost drift anchor ({anchor_key}): {base_cal:.2f}s -> {now_cal:.2f}s "
              f"= {drift:.3f}x (per-query 'norm' = ratio / drift; gates apply to norm)")
    # both totals over the SHARED key set — summing all current queries
    # would inflate the ratio whenever new queries exist
    total_b = sum(v for k, v in base.items() if k in now)
    total_n = sum(v for k, v in now.items() if k in base)
    # on a drifted host, print the normalized total next to the raw one so
    # the headline agrees with the per-query verdicts (ADVICE r11)
    norm_total = (f"  normalized {total_n / total_b / drift:.2f}x (raw/drift)"
                  if drift else "")
    print(f"\ntotal (shared queries): base {total_b:.1f}s -> now {total_n:.1f}s "
          f"({total_n / total_b:.2f}x){norm_total}  baseline={os.path.basename(baseline_path)}"
          + (f"  baseline battery spread {host_spread}x over "
             f"{(doc.get('runs') or {}).get('n')} runs" if host_spread else
             "  (baseline has no run metadata; flat threshold)"))
    # Fresh-process recheck (VERDICT r13 task #3): a flag from the shared-
    # JVM battery is only a HYPOTHESIS of regression — r12 and r13 both
    # produced flags that a one-JVM-per-query A/B then cleared (heap
    # carryover; spark.stop() does not reset the heap).  Re-measure every
    # flagged query in its own process (tools/bench_one.py, median of 3)
    # and downgrade flags whose fresh drift-normalized ratio clears the
    # gate.  A query that is genuinely slower stays flagged: the fresh
    # number can only remove battery-ordering noise, not code cost.
    if regressed and not args.no_recheck:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        print(f"\nre-measuring {len(regressed)} flagged row(s) in fresh processes …")
        still = []
        for name, b, t, gate in regressed:
            proc = subprocess.run(
                [sys.executable, os.path.join(ROOT, "tools", "bench_one.py"),
                 name, "--sf-dir", sf_dir, "--runs", "3"],
                capture_output=True, text=True, cwd=ROOT,
            )
            fresh = None
            for ln in (proc.stdout or "").splitlines():
                try:
                    rec = json.loads(ln)
                except ValueError:
                    continue
                if rec.get("query") == name:
                    fresh = rec["median"]
            if fresh is None:
                print(f"  {name}: fresh-process recheck FAILED "
                      f"(rc={proc.returncode}) — flag stands; stderr tail: "
                      f"{(proc.stderr or '')[-300:]!r}")
                still.append((name, b, t, gate))
                continue
            fresh_norm = fresh / b / (drift or 1.0)
            if fresh_norm <= gate:
                print(f"  {name}: battery {t:.2f}s but fresh-process median "
                      f"{fresh:.2f}s = {fresh_norm:.2f}x norm (gate {gate:.2f}x)"
                      f" — heap-carryover artifact, flag cleared")
            else:
                print(f"  {name}: fresh-process median {fresh:.2f}s = "
                      f"{fresh_norm:.2f}x norm still beyond gate {gate:.2f}x"
                      f" — REGRESSION confirmed")
                still.append((name, b, fresh, gate))
        regressed = still

    if regressed:
        print(f"\n{len(regressed)} regression(s) beyond their gates:")
        for name, b, t, gate in regressed:
            print(f"  {name}: {b:.2f}s -> {t:.2f}s (gate {gate:.2f}x)")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
