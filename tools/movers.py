#!/usr/bin/env python3
"""Pre-commit bench mover gate (r13 verdict #3).

Before a fresh bench record is committed (SPARK_GRAFT_RECORD=1), every
per-query line is compared CALIBRATION-NORMALIZED against the last
COMMITTED record — never against a driver overlay, whose calibration
may reflect a loaded box (the r13 adjudication trap: normalizing by a
transiently-doubled divisor makes any unchanged line read "reversed").

A query is a MOVER when BOTH
  - normalized ratio  (t_new/cal_new) / (t_old/cal_old)  > 1.5, and
  - absolute new time > 0.5 s            (sub-0.5 s lines are the
    known documents-table noise class — reversed in r11, r12, r13)

Every mover must be rerun solo min-of-3 on a quiet box and either
reverse (box noise — re-record or annotate) or be declared in
SURVEY.md §6 BEFORE the record commits. The script prints the exact
rerun command.

Usage:
  python3 tools/movers.py <fresh_record.json> [committed_record.json]

The committed record defaults to `git show HEAD:BENCH_LOCAL.json`.
Exit 1 when any mover is flagged (wire this ahead of the record
commit), 0 otherwise. Improvements >1.5x are listed informationally —
they need no adjudication but usually have a story worth one §6 line.
"""
import json
import subprocess
import sys

THRESH = 1.5
ABS_FLOOR_SEC = 0.5


def load_fresh(path):
    with open(path) as f:
        return json.load(f)


def load_committed(path):
    if path is not None:
        with open(path) as f:
            return json.load(f)
    out = subprocess.run(
        ["git", "show", "HEAD:BENCH_LOCAL.json"],
        capture_output=True, text=True, check=True)
    return json.loads(out.stdout)


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    fresh = load_fresh(sys.argv[1])
    base = load_committed(sys.argv[2] if len(sys.argv) > 2 else None)
    cal_f, cal_b = fresh["calibration"], base["calibration"]
    qf, qb = fresh["queries"], base["queries"]
    if fresh.get("sf") != base.get("sf"):
        print(f"WARN: sf mismatch (fresh {fresh.get('sf')} vs "
              f"committed {base.get('sf')}) — ratios are meaningless")
    print(f"calibration: fresh {cal_f} vs committed {cal_b} "
          f"(x{cal_f / cal_b:.2f})")

    common = sorted(set(qf) & set(qb))
    regressions, improvements = [], []
    for q in common:
        tn, to = qf[q], qb[q]
        ratio = (tn / cal_f) / (to / cal_b)
        if ratio > THRESH and tn > ABS_FLOOR_SEC:
            regressions.append((ratio, q, to, tn))
        elif ratio < 1 / THRESH and to > ABS_FLOOR_SEC:
            improvements.append((ratio, q, to, tn))

    new_q = sorted(set(qf) - set(qb))
    if new_q:
        print(f"new queries (no baseline): {', '.join(new_q)}")
    gone_q = sorted(set(qb) - set(qf))
    if gone_q:
        print(f"queries missing from fresh record: {', '.join(gone_q)}")

    for ratio, q, to, tn in sorted(improvements):
        print(f"  faster x{1 / ratio:.2f}  {q}: {to}s -> {tn}s (info)")

    if not regressions:
        print(f"OK: no movers >{THRESH}x among {len(common)} common queries")
        return 0

    print(f"\nMOVERS >{THRESH}x normalized (and >{ABS_FLOOR_SEC}s absolute) "
          f"— adjudicate solo min-of-3 on a quiet box before committing:")
    for ratio, q, to, tn in sorted(regressions, reverse=True):
        print(f"  x{ratio:.2f}  {q}: {to}s -> {tn}s")
    names = ",".join(q for _, q, _, _ in regressions)
    print("\nrerun solo:")
    print(f"  SPARK_GRAFT_SF_DIR={fresh.get('sf')} SPARK_GRAFT_ONLY={names} \\")
    print("    java -cp 'target/scala-2.13/classes:/opt/spark/jars/*' "
          "<add-opens...> -Xmx24g graft.Bench")
    print("then either re-record (reversed = box noise) or declare the "
          "regression in SURVEY.md §6.")
    return 1


if __name__ == "__main__":
    sys.exit(main())
