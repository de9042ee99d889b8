#!/usr/bin/env python3
"""check.py's machine-artifact twin: same oracle compare (columns
sorted by name, rows sorted, exact value equality), but emits ONE JSON
file per run in the driver's CORRECTNESS_r{N}.json schema
(rows_match / schema_match / hash_match / spark_rows / oracle_rows /
err per query) so scale sweeps (sf1, natural-growth, skew) are
committable, diffable artifacts instead of prose records.

Usage: python3 tools/check_json.py <sfDir> <outDir> <jsonOut> [note]
       [--present-only]

--present-only: cover only queries whose spark output directory exists
(for family-subset sweeps where Verify ran with a query filter); the
full-registry sweeps must NOT pass it, so a silently-missing output
still fails the artifact.
"""
import json, sys, glob, os
import duckdb


def load(con, sf_dir):
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(cols), sorted(
        out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main():
    args = [a for a in sys.argv[1:] if a != "--present-only"]
    present_only = "--present-only" in sys.argv
    sf_dir, out_dir, json_out = args[0], args[1], args[2]
    note = args[3] if len(args) > 3 else None
    con = duckdb.connect()
    load(con, sf_dir)
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    result = {}
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        res_dir = f"{out_dir}/{name}"
        if present_only and not os.path.isdir(res_dir):
            continue
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "spark_rows": None,
                 "oracle_rows": None, "err": None}
        result[name] = entry
        if not os.path.isdir(res_dir):
            entry["err"] = "no spark output"
            continue
        try:
            sp = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'")
            sp_cols = [c[0] for c in sp.description]
            sp_rows = sp.fetchall()
            du = con.execute(sql)
            du_cols = [c[0] for c in du.description]
            du_rows = du.fetchall()
        except Exception as e:
            entry["err"] = str(e)[:300]
            continue
        sc, sr = canon(sp_rows, sp_cols)
        dc, dr = canon(du_rows, du_cols)
        entry["spark_rows"] = len(sr)
        entry["oracle_rows"] = len(dr)
        entry["schema_match"] = sc == dc
        entry["rows_match"] = len(sr) == len(dr)
        entry["hash_match"] = (entry["schema_match"] and entry["rows_match"]
                               and all(a == b for a, b in zip(sr, dr)))
        if entry["hash_match"]:
            n_ok += 1
        else:
            first = next(((a, b) for a, b in zip(sr, dr) if a != b), None)
            print(f"FAIL {name}: schema={entry['schema_match']} "
                  f"rows={len(sr)}/{len(dr)} first_diff={first}")
    artifact = {"sf_dir": sf_dir, "out_dir": out_dir,
                "n_queries": len(result), "n_pass": n_ok}
    if note:
        artifact["note"] = note
    artifact["queries"] = result
    with open(json_out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=False)
    print(f"== {n_ok}/{len(result)} pass -> {json_out} ==")
    # 0/0 is never a pass: with --present-only a misconfigured outDir or
    # query filter would otherwise mint a vacuous green artifact
    # (round-10 advisory)
    sys.exit(0 if result and n_ok == len(result) else 1)


if __name__ == "__main__":
    main()
