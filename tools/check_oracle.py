#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB differential gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet result (written by graft.Verify), runs the
paired oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
fixture tables, and compares: shape, column names (sorted), and values
(exact; row order respected, plus a sorted-rows fallback report).
"""
import duckdb, json, math, sys

def driver_probe(name, got, exp):
    """Emulate the driver's pandas-side compare: materialize both results as
    pandas DataFrames, check per-column dtypes (DuckDB HUGEINT becomes
    float64 here while Spark parquet stays int64 — fetchall() hides this),
    and probe sort_values, which throws on unhashable ndarray cells exactly
    like the driver's checker does."""
    problems = []
    gdf, edf = got.df(), exp.df()
    for c in sorted(set(gdf.columns) & set(edf.columns)):
        gt, et = gdf[c].dtype, edf[c].dtype
        # Width differences (int32 vs int64) pass the driver's compare
        # (r1 evidence: t1_tokenize/w1_ranking were hash-green); only KIND
        # mismatches fail (DuckDB HUGEINT -> float64 vs Spark int64).
        if gt.kind != et.kind:
            problems.append(f"dtype[{c}]: spark={gt} duck={et}")
    for label, df in (("spark", gdf), ("duck", edf)):
        try:
            df.sort_values(sorted(df.columns))
        except Exception as e:
            problems.append(f"sort_values crash ({label}): {type(e).__name__}: {e}")
    return problems

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            gcols = got.columns
            grows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql)
            ecols = exp.columns
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gorder = sorted(range(len(gcols)), key=lambda i: gcols[i])
        eorder = sorted(range(len(ecols)), key=lambda i: ecols[i])
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: columns {sorted(gcols)} != {sorted(ecols)}")
            n_fail += 1
            continue
        g = [tuple(norm(r[i]) for i in gorder) for r in grows]
        e = [tuple(norm(r[i]) for i in eorder) for r in erows]
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        if g == e:
            probs = driver_probe(name, con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"),
                con.sql(sql))
            if probs:
                print(f"FAIL {name}: values match but driver-compare would fail:")
                for p in probs:
                    print(f"     {p}")
                n_fail += 1
            else:
                print(f"ok   {name} ({len(g)} rows)")
                n_ok += 1
        elif sorted(g) == sorted(e):
            print(f"WARN {name}: values match but ROW ORDER differs")
            n_fail += 1
        else:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs:")
            for i, a, b in bad:
                print(f"     row {i}: spark={a}")
                print(f"              duck ={b}")
            n_fail += 1
    print(f"== {n_ok} ok, {n_fail} fail / {n_ok + n_fail} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
