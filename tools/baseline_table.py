#!/usr/bin/env python3
"""Regenerate the per-query baseline table in BASELINE.md (round-9 advice
#7): one row per query in tools/bench_baseline.json -- best-known median +
the artifact it came from -- injected between the BEGIN/END markers so the
table is tool-owned and regenerable at round close.

Usage: python3 tools/baseline_table.py [tools/bench_baseline.json] [BASELINE.md]
"""
import json
import os
import sys

BEGIN = "<!-- BEGIN PER_QUERY_BASELINE (tools/baseline_table.py) -->"
END = "<!-- END PER_QUERY_BASELINE -->"


def render(base):
    entries = sorted((k, v) for k, v in base.items() if not k.startswith("_"))
    total = sum(v["best"] for _, v in entries)
    lines = [
        BEGIN,
        "",
        f"{len(entries)} queries, best-median sum **{total:.2f} s** "
        f"(regenerate: `python3 tools/baseline_table.py`).",
        "",
        "| query | best median (s) | source artifact |",
        "|---|---|---|",
    ]
    for name, v in entries:
        lines.append(f"| `{name}` | {v['best']:.3f} | `{v['source']}` |")
    lines += ["", END]
    return "\n".join(lines)


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    base_path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(here, "bench_baseline.json")
    md_path = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(here, "..", "BASELINE.md")
    base = json.load(open(base_path))
    table = render(base)
    md = open(md_path).read()
    if BEGIN in md and END in md:
        pre, rest = md.split(BEGIN, 1)
        _, post = rest.split(END, 1)
        md = pre + table + post
    else:
        md = md.rstrip() + "\n\n## Per-query best-known medians\n\n" + \
            table + "\n"
    open(md_path, "w").write(md)
    print(f"wrote {len([k for k in base if not k.startswith('_')])} rows "
          f"to {md_path}")


if __name__ == "__main__":
    main()
