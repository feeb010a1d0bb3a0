#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: verify_local.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (graft.Verify output), runs the matching
SQL from <outDir>/oracle_sql.json in DuckDB against the sfDir tables, and
compares: columns sorted by name, rows as a sorted multiset, exact values
(with a small float report when exact fails).

Also enforces the ORACLE RUNTIME BUDGET (round-8 verdict: one 225s oracle
starved the driver's gate into an empty artifact): every oracle must run in
DuckDB under ORACLE_BUDGET_SEC at sf0.01, and the whole pass under
SUITE_BUDGET_SEC. Budget breaches are BUDGET lines and fail the exit code
even when values match — a correct query whose oracle kills the grading
artifact is not done.
"""
import sys, json, math, datetime, time
import duckdb
import pyarrow.dataset as pads

ORACLE_BUDGET_SEC = 10.0
SUITE_BUDGET_SEC = 300.0

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm_val(v):
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        return v  # exact compare; report-only tolerance below
    if isinstance(v, list):
        return tuple(norm_val(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v

def to_rows(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    rows = [tuple(norm_val(col[i]) for col in data) for i in range(table.num_rows)]
    return cols, sorted(rows, key=repr)

def float_close(a, b):
    if a is None or b is None: return a is b
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b or abs(a-b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(float_close(x, y) for x, y in zip(a, b))
    return a == b

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    only = set(sys.argv[3:])  # optional: restrict to named queries (dev loop)
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = n_budget = 0
    t_suite = time.time()
    slowest = []
    for name, sql in sorted(oracle.items()):
        try:
            got_cols, got = to_rows(pads.dataset(f"{outdir}/{name}").to_table())
            t0 = time.time()
            exp_tbl = con.sql(sql).arrow()
            dt = time.time() - t0
            slowest.append((dt, name))
            if dt > ORACLE_BUDGET_SEC:
                print(f"BUDGET {name}: oracle took {dt:.1f}s > {ORACLE_BUDGET_SEC}s")
                n_budget += 1
            exp_cols, exp = to_rows(exp_tbl)
        except Exception as e:
            print(f"FAIL {name}: error {e}"); n_fail += 1; continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} vs {exp_cols}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        if got == exp:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1; continue
        # diagnose
        diffs = [(g, e) for g, e in zip(got, exp) if g != e]
        close = all(float_close(g, e) for g, e in diffs)
        tag = "CLOSE(float-ulp)" if close else "MISMATCH"
        print(f"FAIL {name}: {len(diffs)}/{len(got)} differing rows [{tag}]")
        for g, e in diffs[:3]:
            print(f"   got {g}\n   exp {e}")
        n_fail += 1
    suite_dt = time.time() - t_suite
    top = ", ".join(f"{n}={d:.1f}s" for d, n in sorted(slowest, reverse=True)[:5])
    print(f"== {n_pass} pass / {n_fail} fail / {n_budget} over-budget ==")
    print(f"== oracle suite {suite_dt:.1f}s (budget {SUITE_BUDGET_SEC:.0f}s; slowest: {top}) ==")
    if not only and suite_dt > SUITE_BUDGET_SEC:
        print(f"BUDGET suite: {suite_dt:.1f}s > {SUITE_BUDGET_SEC}s")
        n_budget += 1
    sys.exit(1 if (n_fail or n_budget) else 0)

if __name__ == "__main__":
    main()
