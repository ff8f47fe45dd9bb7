#!/usr/bin/env python3
"""Diff two bench runs per query.

Usage:
  python3 tools/compare_bench.py                # first vs last line of bench_history.jsonl
  python3 tools/compare_bench.py A.json B.json  # any two files each holding one
                                                # {"queries": {...}} JSON object
                                                # (bench_history lines or BENCH_r*.json
                                                # with the JSON on the "tail" field)

Prints per-query deltas sorted by regression, plus totals. Run-to-run noise
on this host is up to +/-30% — compare medians of repeated runs before
believing a single delta.
"""
import json, re, sys


def load(path_or_line):
    if isinstance(path_or_line, str) and path_or_line.lstrip().startswith("{"):
        raw = path_or_line
    else:
        raw = open(path_or_line).read()
    try:
        obj = json.loads(raw)
    except json.JSONDecodeError:
        obj = None
    if obj is not None and "queries" in obj:
        return obj
    if obj is not None and "tail" in obj:  # driver BENCH_r*.json wrapper
        m = re.search(r'\{"metric".*?\}(?=\n|$)', obj["tail"])
        return json.loads(m.group(0))
    m = re.search(r'\{"metric".*\}', raw)
    return json.loads(m.group(0))


def main(argv):
    if len(argv) == 2:
        a, b = load(argv[0]), load(argv[1])
    else:
        lines = [l for l in open("bench_history.jsonl") if l.strip()]
        a, b = load(lines[0]), load(lines[-1])
    qa, qb = a["queries"], b["queries"]
    rows = []
    for k in sorted(set(qa) | set(qb)):
        va, vb = qa.get(k), qb.get(k)
        d = (vb - va) if (va is not None and vb is not None) else None
        rows.append((d if d is not None else float("-inf"), k, va, vb))
    rows.sort(reverse=True)
    print(f"{'query':26s} {'A':>7s} {'B':>7s} {'delta':>7s}")
    for d, k, va, vb in rows:
        sa = f"{va:7.2f}" if va is not None else "    new" if vb is not None else "      -"
        sb = f"{vb:7.2f}" if vb is not None else "   gone"
        sd = f"{d:+7.2f}" if d not in (None, float("-inf")) else "       "
        print(f"{k:26s} {sa} {sb} {sd}")
    ta, tb = a.get("value"), b.get("value")
    common = [(qa[k], qb[k]) for k in set(qa) & set(qb)]
    ca, cb = sum(x for x, _ in common), sum(y for _, y in common)
    print(f"\ntotal: A={ta:.1f}s B={tb:.1f}s   common-query subtotal: A={ca:.1f}s B={cb:.1f}s")
    if b.get("failed"):
        print(f"FAILED in B: {b['failed']}")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main(sys.argv[1:]))
    except BrokenPipeError:  # e.g. piped into head
        sys.exit(0)
