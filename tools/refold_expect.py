#!/usr/bin/env python3
"""Refold bench_expect.json from one or more bench record files.

Usage: python3 tools/refold_expect.py RECORD.json [RECORD2.json ...]
       [--reset q1,q2,...] [--out bench_expect.json] [--prune]

Folds the per-query/per-stage MINIMUM across the given records into
the existing expectations (min with the committed value). Queries
named in --reset had a CODE change this round: their old expectation
is not a same-code pair, so they take the minimum of THIS round's
records only (never the old value).

The expectation file drives Bench's one-sided outlier retry; keeping
it a faithful same-code minimum is what makes the retry rule honest
(see Bench.scala's overExpect note).

Census assert (round 17): the folded expectation-row set must equal
the row set the records actually ran (queries + stages). A renamed
query would otherwise leave its old expectation orphaned in the file
forever (the r16 `ts_ewma` class, caught only by git archaeology) —
the orphan is dead weight at best and a wrong retry trigger at worst
if the name is ever reused. Orphans fail the refold; pass --prune to
drop them instead (the explicit "yes, that row was renamed" ack).
"""
import json
import sys


def main() -> None:
    records, reset, out, prune = [], set(), "bench_expect.json", False
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--reset":
            i += 1
            reset |= set(x for x in args[i].split(",") if x)
        elif args[i] == "--out":
            i += 1
            out = args[i]
        elif args[i] == "--prune":
            prune = True
        else:
            records.append(args[i])
        i += 1
    if not records:
        sys.exit("need at least one bench record file")

    new: dict[str, float] = {}
    for path in records:
        with open(path) as fh:
            rec = json.load(fh)
        for sect in ("queries", "stages"):
            for k, v in rec.get(sect, {}).items():
                new[k] = min(new.get(k, v), v)

    try:
        with open(out) as fh:
            cur = json.load(fh)
    except FileNotFoundError:
        cur = {}

    folded = dict(cur)
    for k, v in new.items():
        folded[k] = v if k in reset else min(v, cur.get(k, v))
    # a reset name absent from the new records would silently keep its
    # stale (old-code) expectation — that defeats the reset
    missing = reset - set(new)
    if missing:
        sys.exit(f"--reset names not present in the records: {missing}")

    # census assert: an expectation for a row no record ran is an
    # orphan (renamed/removed query) — fail unless --prune drops it
    orphans = set(folded) - set(new)
    if orphans:
        if not prune:
            sys.exit(
                f"census mismatch: {len(orphans)} expectation(s) have no "
                f"row in the given records (renamed or removed query?): "
                f"{sorted(orphans)}\n"
                f"re-run with --prune to drop them, or include a record "
                f"that still runs them")
        for k in orphans:
            del folded[k]
        print(f"pruned {len(orphans)} orphaned expectation(s): "
              f"{sorted(orphans)}")

    with open(out, "w") as fh:
        json.dump(dict(sorted(folded.items())), fh, indent=1)
        fh.write("\n")
    changed = {k: (cur.get(k), folded[k]) for k in folded
               if cur.get(k) != folded[k]}
    print(f"folded {len(records)} record(s); {len(changed)} "
          f"expectation(s) moved; wrote {out}")
    for k, (o, n) in sorted(changed.items()):
        print(f"  {k}: {o} -> {n}")


if __name__ == "__main__":
    main()
