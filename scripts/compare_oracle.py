#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/compare_oracle.py <sfDir> <verifyOutDir>

Loads each <name>.parquet the Verify main dumped, runs the matching oracle
SQL from oracle_sql.json in DuckDB (tables = views over <sfDir>/*.parquet),
and compares: column names (sorted), row count, and values — exact first,
then with 1e-9 relative tolerance as a diagnostic.
"""
import json, math, sys, glob, os
import duckdb

def norm(v):
    if isinstance(v, float):
        return v
    return v

def rows_of(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
    return [cols[i] for i in order], out

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b or str(a) == str(b)

def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return eq(a, b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        qname = os.path.basename(qdir)
        got_cols, got_rows = rows_of(con, f"SELECT * FROM '{qdir}/*.parquet'")
        if qname not in oracle:
            n_noracle += 1
            print(f"  ~ {qname}: no oracle, rows={len(got_rows)} "
                  + ("OK" if got_rows else "EMPTY!"))
            continue
        try:
            exp_cols, exp_rows = rows_of(con, oracle[qname])
        except Exception as e:
            n_fail += 1
            print(f"  ✗ {qname}: oracle SQL error: {e}")
            continue
        gc, gr = canon(got_cols, got_rows)
        ec, er = canon(exp_cols, exp_rows)
        if gc != ec:
            n_fail += 1
            print(f"  ✗ {qname}: column mismatch got={gc} exp={ec}")
            continue
        if len(gr) != len(er):
            n_fail += 1
            print(f"  ✗ {qname}: rowcount got={len(gr)} exp={len(er)}")
            continue
        exact = all(all(eq(a, b) for a, b in zip(r1, r2)) for r1, r2 in zip(gr, er))
        if exact:
            n_pass += 1
            print(f"  ✓ {qname}: exact match ({len(gr)} rows)")
        else:
            near = all(all(close(a, b) for a, b in zip(r1, r2)) for r1, r2 in zip(gr, er))
            n_fail += 1
            tag = "CLOSE (float drift)" if near else "VALUE MISMATCH"
            print(f"  ✗ {qname}: {tag}")
            shown = 0
            for r1, r2 in zip(gr, er):
                for i, (a, b) in enumerate(zip(r1, r2)):
                    if not eq(a, b) and shown < 5:
                        print(f"      col {gc[i]}: got={a!r} exp={b!r}")
                        shown += 1
    print(f"PASS={n_pass} FAIL={n_fail} NO_ORACLE={n_noracle}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
