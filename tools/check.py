#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
reads each <outDir>/<name> parquet result, runs the matching oracle SQL
from oracle_sql.json in DuckDB over the same sf tables, and compares
values exactly (columns sorted by name, rows sorted by all columns).

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import json, sys, glob, os
import duckdb

def load(con, sf_dir):
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    load(con, sf_dir)
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            # HUGEINT guard: DuckDB sum(BIGINT) yields HUGEINT, which the
            # driver's hasher encodes differently from Spark's int64 even
            # when the values agree — cost us 4 queries in round 1.
            types = con.execute(f"DESCRIBE {sql}").fetchall()
            hug = [r[0] for r in types if "HUGEINT" in r[1]]
            if hug:
                print(f"FAIL {name}: oracle emits HUGEINT column(s) {hug}; CAST to BIGINT")
                n_bad += 1
                continue
            # DECIMAL guard: the driver's hasher encodes Spark-parquet
            # decimals and DuckDB decimals differently even when values
            # compare equal — cost us p05 in round 6. Cast to DOUBLE at
            # the output boundary on BOTH sides (keep decimal inside the
            # model layer).
            dec = [r[0] for r in types if "DECIMAL" in r[1]]
            if dec:
                print(f"FAIL {name}: oracle emits DECIMAL column(s) {dec}; "
                      f"CAST to DOUBLE at the output boundary")
                n_bad += 1
                continue
            # Nested-type guard: the driver's pandas-based checker sorts
            # rows by every column; an array/struct/map-typed output column
            # crashes it ("unhashable type: numpy.ndarray") — cost us q50 in
            # round 4. Reject nested output so this replica is strictly
            # HARDER than the driver's gate, never laxer.
            sp_types = con.execute(
                f"DESCRIBE SELECT * FROM '{res_dir}/*.parquet'").fetchall()
            sp_dec = [r[0] for r in sp_types if "DECIMAL" in r[1]]
            if sp_dec:
                print(f"FAIL {name}: spark output has DECIMAL column(s) "
                      f"{sp_dec}; cast to DOUBLE at the output boundary")
                n_bad += 1
                continue
            nested = [r[0] for r in sp_types
                      if any(t in r[1] for t in ("[]", "STRUCT", "MAP", "LIST"))]
            if nested:
                print(f"FAIL {name}: spark output has nested-typed column(s) "
                      f"{nested}; serialize at the output boundary "
                      f"(concat_ws / to_json)")
                n_bad += 1
                continue
            sp = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'")
            sp_cols = [c[0] for c in sp.description]
            sp_rows = sp.fetchall()
            du = con.execute(sql)
            du_cols = [c[0] for c in du.description]
            du_rows = du.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        sc, sr = canon(sp_rows, sp_cols)
        dc, dr = canon(du_rows, du_cols)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}"); n_bad += 1; continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows {len(sr)} vs {len(dr)}"); n_bad += 1; continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sr)} mismatched rows; first: spark={bad[0][0]} duck={bad[0][1]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(sr)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
