#!/usr/bin/env python3
"""Calib-normalized bench comparison (VERDICT r16 task 4).

Usage: benchdiff.py OLD.json NEW.json [threshold]

Each record is a Bench JSON line (or a driver BENCH_r*.json whose `tail`
holds the line). Per-query times divide by their record's `calib` before
comparison, so box-speed drift between runs cancels out — r14's "1.6-1.9x
regressions" were pure box drift that this normalization makes visible.
Queries whose normalized ratio exceeds the threshold (default 1.2) are
flagged; exit 1 if any regression is flagged, so a round close can gate
on it.  Only queries present in BOTH records' headline dicts compare
(Bench emits the slowest ~40; the rest are sub-noise).
"""
import json
import re
import sys


def load(path):
    text = open(path).read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d
    # driver record: the bench line is embedded in `tail` (possibly
    # truncated at the front — recover calib+queries with a regex)
    blob = d.get("tail", text) if isinstance(d, dict) else text
    m = re.search(r'\{"metric":"total".*?"sf":"[^"]*"\}', blob, re.S)
    if m:
        return json.loads(m.group(0))
    cal = re.search(r'"calib":([0-9.]+)', blob)
    qs = re.search(r'"queries":(\{[^}]*\})', blob)
    if cal and qs:
        return {"calib": float(cal.group(1)), "queries": json.loads(qs.group(1))}
    raise SystemExit(f"{path}: no bench record found")


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2

    # r16+ records carry calib_end too: the box drifts DURING a run, so
    # normalize by the midpoint of the run's box-speed envelope when
    # available (a start-only probe mis-normalizes late-running queries)
    def calib_of(d):
        c = d.get("calib")
        e = d.get("calib_end")
        return (c + e) / 2 if c and e else c

    co, cn = calib_of(old), calib_of(new)
    if not co or not cn:
        raise SystemExit("both records need a calib field (r15+)")
    rows = []
    zero_regressed = []
    for q, tn in new["queries"].items():
        if q in old["queries"]:
            to = old["queries"][q]
            # Bench prints 3-decimal seconds: a sub-ms query rounds to 0.0,
            # and a zero on either side makes the ratio meaningless (a zero
            # OLD time would divide by zero and abort the whole diff).
            # Never skip SILENTLY though — a sub-ms query blowing up to
            # real seconds is exactly a regression this tool exists for.
            if to <= 0 or tn <= 0:
                if to <= 0 and tn >= 0.1:
                    zero_regressed.append((q, to, tn))
                else:
                    print(f"  skipped (0.0s record)  {q:<40} {to:.3f} -> {tn:.3f}")
                continue
            no, nn = to / co, tn / cn
            rows.append((nn / no, q, to, tn, no, nn))
    rows.sort(reverse=True)
    print(f"calib: old={co:.3f} new={cn:.3f} (box ratio {cn / co:.2f}x)")
    if "value" in old and "value" in new:
        print(f"total: raw {old['value']:.1f}s -> {new['value']:.1f}s | "
              f"normalized {old['value'] / co:.1f} -> {new['value'] / cn:.1f} "
              f"calib-units ({new['value'] / cn / (old['value'] / co):.2f}x)")
    print(f"{'norm-ratio':>10}  {'query':<40} {'old(s)':>8} {'new(s)':>8}  flag")
    flagged = 0
    for q, to, tn in zero_regressed:
        flagged += 1
        print(f"{'n/a':>10}  {q:<40} {to:>8.3f} {tn:>8.3f}  REGRESSION (sub-ms record grew real)")
    for r, q, to, tn, _, _ in rows:
        flag = "REGRESSION" if r > thr else ("improved" if r < 1 / thr else "")
        if r > thr:
            flagged += 1
        print(f"{r:>10.2f}  {q:<40} {to:>8.3f} {tn:>8.3f}  {flag}")
    print(f"== {flagged} normalized regression(s) over {thr}x "
          f"across {len(rows)} common queries")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
