#!/usr/bin/env python3
"""Fixture tests for check_bench.py's gates (r18 verdict #2).

The streaming-ingest gate shipped with r19 after the r18 driver window
carried a 13x ingest collapse that check_bench never looked at. These
synthetic fixtures pin the gate's behavior so a future edit can't silently
drop it again:

  1. healthy run        -> exit 0, no streaming flag
  2. all-reps-slow      -> exit 1, REGRESS streaming_ingest
  3. outlier-rep median -> exit 0, soft flag only (one rep at band)
  4. per-query all-reps-slow still hard-flags (the original gate)

Run: python3 tools/test_check_bench.py   (also wired into round_gate.sh)
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
CHECK = os.path.join(HERE, "check_bench.py")


def write_bench(path, queries, reps_detail, stream_value, stream_reps):
    with open(path, "w") as f:
        f.write(json.dumps({"metric": "per_query", "unit": "sec", "reps": 3,
                            "seed": 1, "queries": queries,
                            "reps_detail": reps_detail, "errors": []}) + "\n")
        f.write(json.dumps({"metric": "streaming_ingest",
                            "value": stream_value, "unit": "rows_per_s",
                            "rows": 100000, "reps": 3,
                            "reps_detail": stream_reps}) + "\n")
        f.write(json.dumps({"metric": "total",
                            "value": sum(queries.values()),
                            "unit": "sec"}) + "\n")


def run(bench, baseline):
    p = subprocess.run([sys.executable, CHECK, "--allow-missing",
                        bench, baseline],
                       capture_output=True, text=True)
    return p.returncode, p.stdout


def main():
    tmp = tempfile.mkdtemp(prefix="graft_cbtest.")
    baseline = os.path.join(tmp, "baseline.json")
    # q1 doubles as the only query; no host canaries present -> factor
    # pinned to 1.0, which keeps the fixture thresholds exact.
    json.dump({"q1": {"best": 0.5},
               "_streaming_ingest": {"best": 30000}}, open(baseline, "w"))
    bench = os.path.join(tmp, "bench.json")
    failures = []

    def expect(name, code, want_code, out, want_sub=None, reject_sub=None):
        if code != want_code:
            failures.append(f"{name}: exit {code}, wanted {want_code}\n{out}")
        if want_sub and want_sub not in out:
            failures.append(f"{name}: missing '{want_sub}' in output\n{out}")
        if reject_sub and reject_sub in out:
            failures.append(f"{name}: unexpected '{reject_sub}' in output\n{out}")

    # 1. healthy: query at best, ingest at band
    write_bench(bench, {"q1": 0.5}, {"q1": [0.5, 0.5, 0.5]},
                30000, [29000, 30000, 31000])
    code, out = run(bench, baseline)
    expect("healthy", code, 0, out, reject_sub="streaming_ingest")

    # 2. ingest collapse, every rep below the 15000 bar -> hard, exit 1
    write_bench(bench, {"q1": 0.5}, {"q1": [0.5, 0.5, 0.5]},
                2490, [2100, 2490, 2600])
    code, out = run(bench, baseline)
    expect("ingest-all-reps-slow", code, 1, out,
           want_sub="REGRESS  streaming_ingest")

    # 3. ambushed median but one rep at band -> soft only, exit 0
    write_bench(bench, {"q1": 0.5}, {"q1": [0.5, 0.5, 0.5]},
                2490, [2100, 2490, 29000])
    code, out = run(bench, baseline)
    expect("ingest-outlier-rep", code, 0, out,
           want_sub="soft     streaming_ingest")

    # 4. the original per-query hard gate still fires
    write_bench(bench, {"q1": 5.0}, {"q1": [4.8, 5.0, 5.2]},
                30000, [29000, 30000, 31000])
    code, out = run(bench, baseline)
    expect("query-all-reps-slow", code, 1, out, want_sub="REGRESS  q1")

    # 5. baseline WITHOUT the _streaming_ingest band: the gate must not
    #    silently vanish — a 'new streaming_ingest' line is printed like
    #    unknown queries (r19 advice #3). Exit stays 0: a missing band is
    #    a bookkeeping nudge, not a regression.
    bare = os.path.join(tmp, "baseline_noband.json")
    json.dump({"q1": {"best": 0.5}}, open(bare, "w"))
    write_bench(bench, {"q1": 0.5}, {"q1": [0.5, 0.5, 0.5]},
                2490, [2100, 2490, 2600])
    code, out = run(bench, bare)
    expect("ingest-no-baseline-band", code, 0, out,
           want_sub="new      streaming_ingest")

    if failures:
        print("\n\n".join(failures))
        print(f"== check_bench fixture tests: {len(failures)} FAILED")
        sys.exit(1)
    print("== check_bench fixture tests: 5/5 ok")


if __name__ == "__main__":
    main()
