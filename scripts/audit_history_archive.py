#!/usr/bin/env python3
"""Archive-driven retroactive bench_history audit (round-11 verdict #4,
the half audit_history.py cannot do).

audit_history.py condemns a minimum only on in-run evidence (an
unresolved retry inside a verified-healthy probe bracket) — one or two
queries per run at best. This script uses the OTHER evidence source:
every committed bench_last.json in git history is a full-surface
observation with its own calibration block. For each query it computes
the ARCHIVED HEALTHY FLOOR: the best (lowest) normalized time across
artifacts whose busy32 calibration sits inside the merge band
(<= BUSY_BAR x the best calibration ever archived — the same bar
Bench.mergeAllowed applies).

What the floor can and cannot prove, learned running it:
- It CANNOT prove a lower history minimum is poisoned. The history
  accumulated minimums from hundreds of uncommitted runs across 12
  rounds; the archive holds ~a dozen snapshots. Order statistics alone
  put min-of-hundreds well below min-of-a-dozen: a naive
  "min < 0.85 x floor" bar condemned 257/285 entries (median ratio
  0.68) — indistinguishable from systematic pre-gate poisoning, and
  re-basing them all would RAISE every bar and mask real regressions.
- It CAN prove a minimum is HARMLESS. The verdict's actual fear is
  false flags: a poisoned min manufactures a flag on a healthy run
  only if the healthy reading exceeds 2 x min AND the raw excess
  beats the gate's 0.5 s absolute floor (Bench.gate). Both are
  computable against the archived floor — so the audit reports, for
  every entry, whether a run at its own archived healthy floor would
  flag. Entries that cannot flag need no re-basing regardless of how
  they were recorded.

Result on the 2026-08-16 archive (20 artifacts, 12 healthy-cal):
ZERO remaining flag-manufacturers — the worst entry sits at 0.50 x its
floor but its raw excess (~0.2 s) is under the gate's absolute floor.
Round 11's four hand-corrected poisonings (BASELINE.md 2026-08-15) were
exactly the entries that COULD flag; the sweep confirms no others
remain. Entries newer than the archive carry __w window stamps instead.

Usage:
  audit_history_archive.py            # full report
  audit_history_archive.py --fix      # re-base any flag-manufacturers
                                      #   to their archived floors
"""
import json, os, subprocess, sys

REPO = os.path.join(os.path.dirname(__file__), "..")
HIST = os.path.join(REPO, "bench_history.json")
BUSY_BAR = 1.15      # Bench.mergeAllowed
FLAG_FACTOR = 2.0    # Bench.gate's flag threshold
FLAG_FLOOR_SEC = 0.5  # Bench.gate's absolute raw-excess floor


def artifacts():
    shas = subprocess.run(
        ["git", "log", "--all", "--format=%H", "--", "bench_last.json"],
        cwd=REPO, capture_output=True, text=True).stdout.split()
    out = []
    for s in shas:
        raw = subprocess.run(["git", "show", f"{s}:bench_last.json"],
                             cwd=REPO, capture_output=True, text=True).stdout
        try:
            a = json.loads(raw)
        except Exception:
            continue
        cal = a.get("calibration", {}).get("busy32_sec", -1)
        if cal and cal > 0 and str(a.get("sf", "")).endswith("sf0.1"):
            out.append((s[:7], cal, a.get("queries", {})))
    return out


def main():
    fix = "--fix" in sys.argv
    arts = artifacts()
    if not arts:
        print("no archived sf0.1 artifacts found")
        sys.exit(1)
    cal_best = min(c for _, c, _ in arts)
    healthy = [(s, c, q) for s, c, q in arts if c <= BUSY_BAR * cal_best]
    print(f"{len(arts)} archived artifacts, {len(healthy)} healthy-cal "
          f"(busy32 best {cal_best})")
    floor = {}
    for s, c, qs in healthy:
        for q, v in qs.items():
            if v is None or v < 0:
                continue
            n = v / c
            if q not in floor or n < floor[q][0]:
                floor[q] = (n, s, c)
    hist = json.load(open(HIST))
    mins = {k: v for k, v in hist.items() if not k.startswith("__")}
    # The raw-excess conversion runs at the TOP of the merge-eligible
    # busy band, not at cal_best: any run whose busy32 is within
    # BUSY_BAR x best is fully flag-eligible, and norm-excess converts
    # to BUSY_BAR x more raw seconds there. (The first version used
    # cal_best and under-detected borderline entries by that factor.)
    #
    # The READING stays the archived floor, deliberately. A
    # median-of-healthy-cal-artifacts reading model was tried and
    # REJECTED: it condemned 45 entries, contradicting ground truth --
    # the best committed healthy full-surface run (4abf9b6, 281.2 s)
    # flagged exactly 4 queries, all poisoned and since fixed; 45 live
    # manufacturers would have put ~45 flags in that artifact.
    # "Healthy-cal" only certifies the START/END busy32 windows, and
    # most archived artifacts were mid-run degraded (the documented
    # wave problem), so their medians overstate a typical
    # healthy-window reading by 1.3-2.5x. The floor IS the empirical
    # healthy-window reading: it comes from the run the round verdicts
    # certify as clean end to end.
    busy_hi = BUSY_BAR * cal_best
    manufacturers, low, unarchived = [], [], []
    for q, m in sorted(mins.items()):
        if q not in floor:
            unarchived.append(q)
            continue
        fl, s, c = floor[q]
        # would a healthy run READING ITS OWN ARCHIVED FLOOR, at the
        # top of the merge-eligible busy band, flag?
        would_flag = (fl > FLAG_FACTOR * m and
                      (fl - m) * busy_hi > FLAG_FLOOR_SEC)
        if would_flag:
            manufacturers.append((q, m, fl, s, c))
            print(f"FLAG-MANUFACTURER {q}: min {m:.3f}, archived healthy "
                  f"floor {fl:.3f} ({fl/m:.2f}x, raw excess "
                  f"{(fl-m)*busy_hi:.2f}s at busy {busy_hi:.3f}, artifact "
                  f"{s}) -- every healthy run at the floor flags; re-base")
        elif m < 0.7 * fl:
            low.append((q, m / fl))
    print(f"{len(manufacturers)} flag-manufacturers; {len(low)} entries "
          f"below 0.7x their floor but HARMLESS (cannot flag at the "
          f"floor: under 2x, or raw excess under {FLAG_FLOOR_SEC}s at "
          f"busy {busy_hi:.3f}); "
          f"{len(unarchived)} newer than the archive (window-stamped "
          "at merge instead)")
    if fix and manufacturers:
        for q, m, fl, s, c in manufacturers:
            hist[q] = round(fl, 3)
            hist[f"__w:{q}"] = c
        body = ",".join(f'"{k}":{v}' for k, v in sorted(hist.items()))
        open(HIST, "w").write("{" + body + "}\n")
        print(f"re-based {len(manufacturers)} entries to their archived "
              "healthy floors (window-stamped)")


if __name__ == "__main__":
    main()
