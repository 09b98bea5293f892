#!/usr/bin/env python3
"""Diff two PLANSTATS.md files and flag PHYSICAL-PLAN regressions.

The bench number hides scale-killers at sf0.1: a new shuffle exchange or
a broadcast-join flip costs milliseconds on 60k rows and hours on 100 TB.
PLANSTATS.md records per-query plan features each round; this tool turns
the between-rounds comparison (previously done by eye) into a gate:

    python3 tools/planstatsdiff.py PLANSTATS_old.md PLANSTATS_new.md \
        [--allow query ...]

Regressions flagged (per common query):
  - xchg-hash up          (a NEW shuffle exchange)
  - SMJ up / BHJ down     (a broadcast join degraded to sort-merge)
  - bcast down w/o BHJ up (a lost broadcast)
  - topk down             (a lost TakeOrderedAndProject pushdown)
  - cached down           (a lost InMemoryTableScan reuse)
  - sortAgg/objAgg up     (a hash-aggregate fallback appeared)
  - scans up              (an extra table scan)

Improvements and added/removed queries print informationally. Exit 1 on
any regression not named by --allow (an EXPLAINED regression belongs in
the round's NOTES.md entry next to its --allow).
"""
import sys


def parse(path):
    rows = {}
    cols = None
    for line in open(path):
        line = line.strip()
        if not line.startswith("|"):
            continue
        cells = [c.strip() for c in line.strip("|").split("|")]
        if cells and cells[0] == "query":
            cols = cells[1:]
            continue
        if cols is None or set(cells[0]) <= {"-", " ", ":"}:
            continue
        name, vals = cells[0], cells[1:]
        try:
            rows[name] = dict(zip(cols, [int(v) for v in vals]))
        except ValueError:
            rows[name] = None  # an ERR row: no features to compare
    if cols is None:
        raise SystemExit(f"{path}: no PLANSTATS table found")
    return rows


# (feature, direction, label): +1 means an INCREASE regresses
CHECKS = [
    ("xchg-hash", +1, "new shuffle exchange"),
    ("SMJ", +1, "sort-merge join appeared"),
    ("BHJ", -1, "broadcast join lost"),
    ("topk", -1, "top-k pushdown lost"),
    ("cached", -1, "cache reuse lost"),
    ("sortAgg", +1, "sort-aggregate fallback"),
    ("objAgg", +1, "object-aggregate fallback"),
    ("scans", +1, "extra scan"),
]


def main():
    # one pass: --allow consumes its value (so the value is never taken
    # as a positional file path); a trailing bare --allow errors cleanly
    args, allow = [], set()
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--allow":
            try:
                allow.add(next(it))
            except StopIteration:
                raise SystemExit("--allow needs a query name")
        else:
            args.append(a)
    if len(args) != 2:
        raise SystemExit(f"usage: planstatsdiff.py OLD.md NEW.md [--allow query ...] (got {args})")
    old, new = parse(args[0]), parse(args[1])
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    flagged, improved = [], []
    for q in common:
        o, n = old[q], new[q]
        if o is None or n is None:
            continue
        for feat, sign, label in CHECKS:
            if feat not in o or feat not in n:
                continue
            delta = (n[feat] - o[feat]) * sign
            if delta > 0:
                flagged.append((q, label, o[feat], n[feat]))
            elif delta < 0:
                improved.append((q, label, o[feat], n[feat]))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    for q, label, ov, nv in improved:
        print(f"  improved   {q:<40} {label}: {ov} -> {nv}")
    hard = 0
    for q, label, ov, nv in flagged:
        tag = "allowed " if q in allow else "REGRESSION"
        if q not in allow:
            hard += 1
        print(f"  {tag} {q:<40} {label}: {ov} -> {nv}")
    print(f"== {hard} unexplained plan regression(s) "
          f"({len(flagged)} total, {len(flagged) - hard} allowed) "
          f"across {len(common)} common queries")
    sys.exit(1 if hard else 0)


if __name__ == "__main__":
    main()
