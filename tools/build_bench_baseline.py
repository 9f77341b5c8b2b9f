#!/usr/bin/env python3
"""Build tools/bench_baseline.json: best-known per-query median across every
committed bench artifact. Handles both artifact shapes:

  - Bench's own output (BENCH_full.json, BENCH_variance_*.json): one JSON
    object per line, per-query medians under metric=per_query
  - the driver's round wrapper (BENCH_rNN.json): a dict whose "tail" string
    embeds (a truncated window of) the same per-query JSON -- parsed by
    regex, so queries cut off by the 2 KB tail window are simply absent

Usage: python3 tools/build_bench_baseline.py BENCH_*.json > tools/bench_baseline.json
"""
import json
import re
import sys

PAIR = re.compile(r'\\?"([a-z0-9_]+)\\?":([0-9]+\.[0-9]+)')
NON_QUERIES = {"value", "bench_total_s", "sf"}


def pairs_from_file(path, known=None):
    """known: query names seen in >=1 structured per_query artifact. The
    regex fallback for driver-wrapper tails admits only names in this set,
    so a future numeric non-query field (e.g. a renamed streaming metric)
    cannot be absorbed into the baseline as a fake query."""
    out = {}
    with open(path) as f:
        txt = f.read()
    try:
        d = json.loads(txt)
        if isinstance(d, dict) and "tail" in d:  # driver wrapper
            for name, val in PAIR.findall(d["tail"]):
                if name in NON_QUERIES:
                    continue
                if known is not None and name not in known:
                    print(f"skip {path}: regex name {name!r} not in any "
                          "structured artifact", file=sys.stderr)
                    continue
                out[name] = float(val)
            return out
    except json.JSONDecodeError:
        pass
    for line in txt.splitlines():  # Bench's own 3-line artifact
        line = line.strip()
        if not line:
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("metric") == "per_query":
            out.update({k: v for k, v in d["queries"].items() if v >= 0})
    return out


def main():
    # Pass 1: names from structured artifacts only (wrapper files return {}
    # here because their tails never contain a metric=per_query line).
    known = set()
    for path in sys.argv[1:]:
        with open(path) as f:
            txt = f.read()
        for line in txt.splitlines():
            try:
                d = json.loads(line.strip())
            except json.JSONDecodeError:
                continue
            if isinstance(d, dict) and d.get("metric") == "per_query":
                known.update(d["queries"])
    best = {}
    for path in sys.argv[1:]:
        for name, sec in pairs_from_file(path, known or None).items():
            if name not in best or sec < best[name]["best"]:
                best[name] = {"best": sec, "source": path.split("/")[-1]}
    # "_meta" is documentation, skipped by check_bench (leading underscore):
    # record which measurement protocol the entries come from so a future
    # rebuild doesn't silently mix protocols (round-7 advice: the 30s
    # periodic-GC + off-clock System.gc() changed per-query comparability).
    out = {"_meta": {"protocol": "round-7 bench protocol (periodic GC 30s, "
                     "off-clock System.gc() between queries, median-of-reps)",
                     "sources": sorted({v["source"] for v in best.values()})}}
    out.update(sorted(best.items()))
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
