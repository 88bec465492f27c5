#!/usr/bin/env python3
"""Retroactive bench_history audit (round-11 verdict #4).

The merge gate (busy32 <= 1.15x best) stops NEW poisoned minimums, but
~280 entries predate it and carry no recording-window provenance.
Full reconstruction from BENCH_r*.json is impossible (the driver
archives truncated stdout tails), so the audit is EVIDENCE-DRIVEN: it
reads a fresh full-surface bench artifact (bench_last.json) and
condemns a recorded minimum only when this run demonstrates it is
unachievable on a healthy host -- the entry was flagged, its retry ran
inside a verified-healthy probe bracket (the awaitHealthyWindow path),
and the retry still could not land within the resolve factor. On a
code-unchanged surface that combination has exactly one explanation:
the minimum was recorded under a degraded-ALU window and never
corresponded to any healthy-host observation.

Usage:
  audit_history.py <artifact.json>              # report suspects
  audit_history.py <artifact.json> --fix q1,q2  # re-base named queries
  audit_history.py <artifact.json> --fix-unresolved  # re-base all
      unresolved-retry suspects whose retry bracket was healthy

Re-basing sets history[q] = the retry's own normalized reading (a
real, healthy-window observation) and stamps __w:q with the retry
bracket's busy32 so the new minimum carries its provenance.
"""
import json, sys, os

HIST = os.path.join(os.path.dirname(__file__), "..", "bench_history.json")
# mirror Bench.scala's bars (mergeAllowed / StreamHealthyFactor /
# RetryResolveFactor) -- keep in sync with the Scala constants
BUSY_BAR, STREAM_BAR, RESOLVE = 1.15, 1.25, 1.3

USAGE = """usage: audit_history.py <bench_artifact.json> [--fix-unresolved | --fix q1,q2,...]
A --fix path rewrites bench_history.json — argument mistakes must die
on usage text, never on a traceback."""

def main():
    if len(sys.argv) < 2 or sys.argv[1].startswith("--"):
        sys.exit(USAGE)
    art_path = sys.argv[1]
    fix = None
    if len(sys.argv) > 2:
        if sys.argv[2] == "--fix-unresolved":
            fix = "unresolved"
        elif sys.argv[2] == "--fix":
            if len(sys.argv) < 4 or not sys.argv[3]:
                sys.exit(USAGE)
            fix = set(sys.argv[3].split(","))
        else:
            sys.exit(USAGE)
    art = json.load(open(art_path))
    hist = json.load(open(HIST))
    busy_best = hist.get("__busy32_best", 0.0)
    retried = art.get("retried", [])
    skipped = art.get("retry_skipped_unhealthy", False)
    if skipped:
        print("artifact stamped retry_skipped_unhealthy: no healthy-window "
              "evidence in this run; re-run the bench on a healthy host")
        sys.exit(1)
    suspects = []
    for e in retried:
        if e.get("resolved"):
            continue
        # the retry bracket's own window health (ratios vs best recorded)
        healthy = (e.get("busy32_ratio", 99) <= BUSY_BAR and
                   e.get("stream32_ratio", 99) <= STREAM_BAR)
        rn, mn = e.get("retry_norm", -1), e.get("min", -1)
        if healthy and rn > 0 and rn > RESOLVE * mn:
            suspects.append((e["q"], mn, rn, e))
    if not suspects:
        print("no unresolved-healthy-retry suspects in this artifact")
    for q, mn, rn, e in suspects:
        print(f"SUSPECT {q}: recorded min {mn:.3f} unreachable -- healthy "
              f"retry measured {rn:.3f} ({rn/mn:.2f}x); window busy32 "
              f"{e.get('busy32_ratio')} stream32 {e.get('stream32_ratio')}")
    if fix:
        names = ({q for q, *_ in suspects} if fix == "unresolved"
                 else fix & {q for q, *_ in suspects})
        missed = (fix - names) if isinstance(fix, set) else set()
        if missed:
            print(f"NOT re-based (not a healthy-retry suspect): {sorted(missed)}")
        busy_retry = None
        for q, mn, rn, e in suspects:
            if q not in names:
                continue
            hist[q] = round(rn, 3)
            # the retry bracket's busy32 = ratio * best
            if busy_best and e.get("busy32_ratio", 0) > 0:
                hist[f"__w:{q}"] = round(e["busy32_ratio"] * busy_best, 3)
            print(f"re-based {q}: min -> {hist[q]}")
        if names:
            body = ",".join(f'"{k}":{v}' for k, v in sorted(hist.items()))
            open(HIST, "w").write("{" + body + "}\n")
            print(f"wrote {len(names)} re-based entries to bench_history.json")

if __name__ == "__main__":
    main()
