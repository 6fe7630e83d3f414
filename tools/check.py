#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (builder-side dev tool;
NOT part of the library). Runs after `sbt "runMain graft.Verify <sfDir> <out>"`:
for each query parquet in <out>, executes the matching oracle SQL in DuckDB
over the same corpus and compares schema + sorted values.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out [out.json]

The optional third arg writes a driver-format JSON artifact (per-query
rows_match/schema_match/hash_match booleans) — committed each round as
CORRECTNESS_LOCAL.json so the correctness signal survives a lost driver
handoff (r12/r16 both came back `{}`).
"""
import json, math, os, sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(round(v, 9))
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    report = {}

    def flush_report():
        # incremental + atomic (r18 verdict #1: three rounds of driver
        # correctness artifacts came back `{}` — a comparator killed
        # mid-run must leave a partial, self-describing report, never
        # nothing): rewrite after EVERY query via tmp + rename
        if json_out:
            tmp = json_out + ".tmp"
            with open(tmp, "w") as f:
                json.dump(report, f, indent=2)
            os.replace(tmp, json_out)

    def rec(name, rows=False, schema=False, hashm=False, sr=None, orr=None, err=None):
        report[name] = {"rows_match": rows, "schema_match": schema,
                        "hash_match": hashm, "spark_rows": sr,
                        "oracle_rows": orr, "err": err}
        flush_report()

    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            rec(name, err=f"no spark output: {str(e)[:200]}")
            n_bad += 1
            continue
        try:
            exp = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            rec(name, sr=got.num_rows, err=f"oracle error: {str(e)[:200]}")
            n_bad += 1
            continue
        gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            rec(name, sr=got.num_rows, orr=exp.num_rows,
                err=f"columns {gcols} != {ecols}")
            n_bad += 1
            continue
        g = canon(got.to_pylist(), gcols)
        e = canon(exp.to_pylist(), ecols)
        if g == e:
            # also flag type mismatches (driver checks schema)
            gt = {c: str(got.schema.field(c).type) for c in gcols}
            et = {c: str(exp.schema.field(c).type) for c in ecols}
            mism = {c: (gt[c], et[c]) for c in gcols if gt[c] != et[c]}
            note = f"  [type-mismatch: {mism}]" if mism else ""
            print(f"ok   {name} ({len(g)} rows){note}")
            rec(name, rows=True, schema=not mism, hashm=True,
                sr=len(g), orr=len(e),
                err=f"type-mismatch: {mism}" if mism else None)
            n_ok += 1
        else:
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            for a, b in list(zip(g, e))[:200]:
                if a != b:
                    print(f"  spark: {a}\n  duck : {b}")
                    break
            only_g = set(g) - set(e)
            only_e = set(e) - set(g)
            for x in list(only_g)[:3]:
                print(f"  only-spark: {x}")
            for x in list(only_e)[:3]:
                print(f"  only-duck : {x}")
            rec(name, rows=len(g) == len(e), schema=True, hashm=False,
                sr=len(g), orr=len(e), err="value mismatch")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    if json_out:
        flush_report()
        print(f"wrote {json_out} ({len(report)} queries)")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
