#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: oracle_check.py <verify_out_dir> <sf_dir>

For each query parquet dir written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json against the sf_dir parquet tables
(registered as views named by file basename), sorts columns by name and
rows by value, and compares cell-by-cell (floats rounded to 9 places).
TYPE-STRICT: an integer cell never equals a float cell (Python's
`19525 == 19525.0` is True, which hid a Spark-BIGINT vs DuckDB-HUGEINT
divergence from this harness for a round while the driver's hash
compare failed it) — floats are tagged so cross-type equality is
impossible. Exit 0 iff all queries match.
"""
import sys, os, json, glob, math
import duckdb

def norm(v):
    if hasattr(v, 'tolist') and not isinstance(v, (int, float)):
        return tuple(norm(x) for x in v.tolist())
    # bools BEFORE the float/int paths (ADVICE r5): Python True == 1, so
    # an untagged bool could silently equal an integer 0/1 column — the
    # same cross-type-equality class the float tag eliminates
    if isinstance(v, bool):
        return ('b', v)
    if isinstance(v, float):
        return ('f', round(v, 9))
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, '*.parquet')):
        name = os.path.basename(p)[:-len('.parquet')]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, 'oracle_sql.json')) as f:
        oracles = json.load(f)
    failures = []
    checked = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        except Exception as e:
            failures.append((name, f'spark output unreadable: {e}'))
            continue
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(got)} rows")
            if len(got) == 0:
                failures.append((name, 'rows-only query returned 0 rows'))
            continue
        checked += 1
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append((name, f'oracle SQL error: {e}'))
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if [c.lower() for c in gc] != [c.lower() for c in ec]:
            failures.append((name, f'column mismatch: spark={gc} oracle={ec}'))
            continue
        g = sorted(tuple(norm(v) for v in row) for row in got[gc].itertuples(index=False, name=None))
        e = sorted(tuple(norm(v) for v in row) for row in exp[ec].itertuples(index=False, name=None))
        if len(g) != len(e):
            failures.append((name, f'row count: spark={len(g)} oracle={len(e)}'))
            continue
        bad = [(a, b) for a, b in zip(g, e) if a != b]
        if bad:
            failures.append((name, f'{len(bad)} differing rows; first: spark={bad[0][0]} oracle={bad[0][1]}'))
        else:
            print(f"  [match] {name}: {len(g)} rows")
    if failures:
        print(f"\n{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  FAIL {n}: {msg}")
        sys.exit(1)
    print(f"\nALL MATCH ({checked} oracle-checked)")

if __name__ == '__main__':
    main()
