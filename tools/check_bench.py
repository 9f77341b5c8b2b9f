#!/usr/bin/env python3
"""Mechanical per-query bench regression check (round-6 advice #6).

Compares a BENCH_full.json artifact (the three-JSON-lines file Bench writes)
against the committed best-known per-query medians in
tools/bench_baseline.json, so a regression is detected by a script instead
of a judge diff.

A query is flagged when its median is BOTH >2x its best-known median AND
>0.3s absolute above it (the absolute floor keeps 0.1s-class queries from
flagging on scheduler jitter). With reps_detail present (round-7 Bench), a
flag is classified:

  - outlier-rep    at least one rep still ran near baseline: the PLAN is
                   fine, the median was ambushed (GC pause / host
                   contention) -> re-run before treating as a regression
  - all-reps-slow  every rep was slow: a real plan/code regression (or a
                   uniformly slower host -- compare the run's total first)

Usage: python3 tools/check_bench.py [--allow-missing] [--prior PRIOR.json]
       [--host-factor F] [BENCH_full.json] [tools/bench_baseline.json]

When the fixed canary set is absent (any filtered run, incl. the stage-5
constrained-heap canary) the factor is PINNED to 1.0 -- never inferred from
the run's own queries (r15 advice #2: self-referential normalization lets a
uniform family regression re-base the gate to itself). --host-factor F
overrides that pin when the caller has measured the host independently.

Also prints the comparable-subset ratio (round-9 advice #8): the sum of this
run's medians over queries that HAVE a baseline entry vs the sum of those
baseline bests -- so round-over-round drift is one grep, not judge
archaeology. With --prior (a previous round's BENCH_full), additionally
prints the run-vs-prior common-query subset totals/ratio.

Exit 1 iff any query is flagged all-reps-slow or errored, or (without
--allow-missing) any baseline query is absent from the run -- a silently
dropped query must not pass the gate.

Host-factor adjustment (round-14, re-based round-15): when the run is on a
slower host than the baselines were recorded on (the r14 re-provisioning
measured uniform 1.7-2.6x canary inflation -- BASELINE.md round-14 note), a
fixed 2x threshold flags noise while masking nothing: a true regression is
slow RELATIVE TO THE RUN'S OWN INFLATION, not relative to a different
machine. The factor is the median ratio over the FIXED CANARY SET below --
trivially-stable, plan-frozen queries (byte-identical plans since round 9)
that no round's code changes touch -- NOT over all queries (round-15 advice:
an all-queries median is self-referential -- a change that uniformly slows
most queries re-bases the gate to its own regression, and new queries whose
baseline came from the same run sit at ratio 1.0 and dilute it). The
thresholds scale CONTINUOUSLY by the canary factor whenever it exceeds 1.0
(never below -- a faster host must not relax the bars): the former >1.5x
step left a gray zone where a persistently ~1.45x host read every
2.1-2.9x untouched query as a code regression. As a second guard, if the
NON-canary queries' median inflation materially exceeds the canaries' own
(>1.5x beyond it), the run is flagged loudly: that pattern is a code-level
slowdown the host cannot explain, and the gate fails.
"""
import json
import os
import sys

# Plan-frozen queries used to estimate the host factor: shapes untouched
# for many rounds (the r14 attribution protocol's probe set plus stable
# heavier shapes — contention inflates shuffle/memory-heavy queries more
# than trivial scans, so the canary mix must include both profiles or the
# factor underestimates what the host costs the heavy half). If code
# changes ever touch one of these, move it out.
HOST_CANARIES = [
    # trivial scans/aggs/windows
    "a1_count_per_key", "h1_pricing_summary", "s6_scan_project",
    "v1_dot_cosine", "w1_ranking", "u1_union_all", "j1_broadcast_join",
    "o1_global_sort",
    # stable heavier shapes (shuffle joins, exact percentile, postings aggs)
    "h6_percentiles", "t4_tfidf", "j2_shuffle_join", "a2_date_histogram",
    "u2_intersect", "f3_content_hash", "w3_moving_avg"]


def load_bench(path):
    per_query, detail, total, stream = {}, {}, None, None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if d.get("metric") == "per_query":
                per_query = d["queries"]
                detail = d.get("reps_detail", {})
            elif d.get("metric") == "total":
                total = d.get("value")
            elif d.get("metric") == "streaming_ingest":
                stream = d
    return per_query, detail, total, stream


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    argv = sys.argv[1:]
    prior_path = None
    if "--prior" in argv:
        i = argv.index("--prior")
        prior_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    host_factor_override = None
    if "--host-factor" in argv:
        i = argv.index("--host-factor")
        host_factor_override = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if a != "--allow-missing"]
    allow_missing = "--allow-missing" in argv
    bench_path = args[0] if len(args) > 0 else \
        os.path.join(here, "..", "BENCH_full.json")
    base_path = args[1] if len(args) > 1 else \
        os.path.join(here, "bench_baseline.json")
    base_raw = json.load(open(base_path))
    # keys starting with "_" are metadata (protocol note), not queries
    base = {k: v for k, v in base_raw.items() if not k.startswith("_")}
    queries, detail, total, stream = load_bench(bench_path)

    # Host factor: median ratio over the FIXED canary set (module docstring).
    # A uniformly slower host inflates the canaries by ~this factor; scaling
    # the flag threshold by it (only when inflation is material, >1.5x)
    # makes the check detect queries out of line WITH THEIR OWN RUN instead
    # of re-litigating the host delta on every query.
    def median(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2] if xs else 1.0

    def ratios(names):
        return [queries[n] / base[n]["best"] for n in names
                if n in base and n in queries and queries[n] >= 0
                and base[n]["best"] > 0]

    canary_ratios = ratios(HOST_CANARIES)
    if len(canary_ratios) < 3:
        # Canary set unavailable or only partially present (filtered run,
        # incl. the round_gate stage-5 constrained-heap canary). r15 advice
        # #2: do NOT fall back to the run's own all-queries median -- a
        # uniform regression of the whole filtered family (the exact spill
        # cliff the stage-5 gate exists to catch) would re-base the
        # threshold to its own inflation and pass. An explicit
        # --host-factor always wins; otherwise (r16 ADVICE #4) USE the 1-2
        # canary ratios that ARE measured rather than discarding them and
        # pinning 1.0 -- a genuinely slow host with partial canary coverage
        # would otherwise hard-flag its queries as code regressions. The
        # canaries are still an independent signal (they're not members of
        # the filtered family under test), just a weaker estimate; say so.
        if host_factor_override is not None:
            canary_ratios = [host_factor_override]
            print(f"host-factor: canaries absent/partial; using explicit "
                  f"--host-factor {host_factor_override:.2f}")
        elif canary_ratios:
            print(f"host-factor: only {len(canary_ratios)}/"
                  f"{len(HOST_CANARIES)} canaries present -- using their "
                  f"median {median(canary_ratios):.2f}x as a WEAKER "
                  "host estimate (r16 advice #4). Prefer full-canary "
                  "windows or --host-factor for filtered runs.")
        else:
            canary_ratios = [1.0]
            print("host-factor: canary queries absent from this run; "
                  "pinned to 1.0 (no self-referential normalization -- "
                  "r15 advice #2). Pass --host-factor to override, and "
                  "compare filtered canary runs against like-for-like "
                  "baselines (e.g. tools/bench_baseline_2g.json).")
    host = median(canary_ratios)
    # Continuous scaling (round-15): the old >1.5x step created a gray zone
    # where a persistently ~1.45x host read every 2.1-2.9x query as a code
    # regression. The canary factor now applies whenever the host is slower
    # at all (never below 1.0 -- a faster host must not relax the bars).
    factor = max(1.0, host)
    if factor > 1.1:
        print(f"host-factor: canary median run/baseline ratio {host:.2f}x "
              f"-- thresholds scaled by {factor:.2f} (slower-host "
              "normalization, BASELINE.md r14/r15 protocol; canaries: "
              f"{len(canary_ratios)}/{len(HOST_CANARIES)})")
    # Independent-signal guard (round-15 advice): if the non-canary queries
    # are inflated well beyond what the canaries say the host costs, that
    # excess is code, not host -- fail loudly instead of re-basing to it.
    rest = ratios([n for n in queries if n not in HOST_CANARIES])
    rest_med = median(rest) if rest else 1.0
    code_inflation = rest and len(canary_ratios) >= 3 and rest_med > 1.5 * host
    if code_inflation:
        print(f"SUSPECT-UNIFORM-REGRESSION: non-canary median ratio "
              f"{rest_med:.2f}x exceeds 1.5x the canary host-factor "
              f"{host:.2f}x -- a broad slowdown the host cannot explain; "
              "gate fails (round-15 advice #1)")

    hard, soft, new = [], [], []
    for name, sec in sorted(queries.items()):
        entry = base.get(name)
        if entry is None:
            new.append((name, sec))
            continue
        best = entry["best"]
        if sec < 0:
            hard.append((name, sec, best, "ERROR (run failed)"))
            continue
        bar = 2.0 * factor * best
        if sec > bar and sec - best > 0.3 * factor:
            reps = detail.get(name, [])
            if reps and min(reps) <= bar:
                soft.append((name, sec, best,
                             f"{sec / best:.1f}x outlier-rep (min rep {min(reps):.2f}s ok)"))
            else:
                hard.append((name, sec, best, f"{sec / best:.1f}x all-reps-slow"))

    # Streaming-ingest gate (r18 verdict #2): the ingest metric was a
    # single-shot rows/s that check_bench ignored entirely, so a 13x
    # collapse in the r18 driver window raised no flag. With the reps-based
    # metric (Bench r19) the same median/outlier treatment applies: the
    # rate is inverse to host speed, so the bar is best_band * 0.5 / factor
    # (mirrors the 2x-slower wall bar). A rep at/above the bar = the PATH
    # is fine, the median was ambushed -> soft; all reps below = hard.
    # Baseline band lives in the baseline json as metadata
    # ("_streaming_ingest": {"best": rows_per_s}); absent -> no gate.
    stream_base = base_raw.get("_streaming_ingest", {}).get("best")
    if stream is not None and not stream_base:
        # r19 advice #3: a baseline regeneration that drops the band must
        # not silently disable the gate -- surface it like unknown queries.
        print("new      streaming_ingest               "
              f"{stream.get('value', -1):.0f} rows/s "
              "(no baseline band -- add _streaming_ingest to the baseline)")
    if stream is not None and stream_base:
        rate = stream.get("value", -1)
        sreps = stream.get("reps_detail", [])
        bar = 0.5 * stream_base / factor
        if rate < 0:
            hard.append(("streaming_ingest", rate, stream_base,
                         "ERROR (a rep failed)"))
        elif rate < bar:
            why = (f"{rate:.0f} rows/s vs band {stream_base:.0f} "
                   f"(bar {bar:.0f})")
            if sreps and max(sreps) >= bar:
                soft.append(("streaming_ingest", rate, stream_base,
                             why + f" outlier-rep (max rep {max(sreps):.0f} ok)"))
            else:
                hard.append(("streaming_ingest", rate, stream_base,
                             why + " all-reps-slow"))

    base_total = sum(v["best"] for v in base.values())
    if total is not None:
        print(f"total: {total:.1f}s vs baseline-sum {base_total:.1f}s "
              f"({total / base_total:.2f}x)")
    # Comparable-subset ratio vs the best-known baseline: only queries that
    # have a baseline entry, so newly added queries don't read as drift.
    shared = [n for n, s in queries.items() if n in base and s >= 0]
    if shared:
        run_sum = sum(queries[n] for n in shared)
        best_sum = sum(base[n]["best"] for n in shared)
        print(f"comparable-vs-baseline: {len(shared)} queries, "
              f"{run_sum:.1f}s vs best-sum {best_sum:.1f}s "
              f"({run_sum / best_sum:.2f}x)")
    if prior_path:
        prior_q, _, prior_total = load_bench(prior_path)
        common = [n for n, s in queries.items()
                  if s >= 0 and prior_q.get(n, -1) >= 0]
        if common:
            cur = sum(queries[n] for n in common)
            prev = sum(prior_q[n] for n in common)
            print(f"comparable-vs-prior: {len(common)} queries, "
                  f"{cur:.1f}s vs prior {prev:.1f}s ({cur / prev:.2f}x)  "
                  f"[prior: {os.path.basename(prior_path)}]")
    for name, sec in new:
        print(f"new      {name:28s} {sec:7.3f}s (no baseline entry -- add it)")
    for name, sec, best, why in soft:
        if name == "streaming_ingest":
            print(f"soft     {name:28s} {why}")
        else:
            print(f"soft     {name:28s} {sec:7.3f}s vs best {best:.3f}s  {why}")
    for name, sec, best, why in hard:
        if name == "streaming_ingest":
            print(f"REGRESS  {name:28s} {why}")
        else:
            print(f"REGRESS  {name:28s} {sec:7.3f}s vs best {best:.3f}s  {why}")
    missing = sorted(set(base) - set(queries))
    # A deliberately-filtered run (--allow-missing) would print hundreds of
    # missing lines; the count in the summary line suffices there.
    if not allow_missing:
        for name in missing:
            print(f"missing  {name} (in baseline, absent from this run)")
    print(f"== {len(hard)} hard, {len(soft)} soft/outlier, {len(new)} new, "
          f"{len(missing)} missing / {len(queries)} run")
    # A query dropped from SparkEntry.queries (or a filtered BENCH_ONLY run)
    # must fail the gate unless the caller opted in with --allow-missing.
    sys.exit(1 if hard or code_inflation
             or (missing and not allow_missing) else 0)


if __name__ == "__main__":
    main()
