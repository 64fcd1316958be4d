#!/usr/bin/env python3
"""Emit a CORRECTNESS_r{N}.json in the driver's format from a Verify dump:
per query {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}. Reuses check.py's canonicalization (columns sorted by name, rows
sorted, exact value compare) so the flags agree with the local gate.

Usage: python3 tools/correctness_json.py <sfDir> <verifyOutDir> <outJson>
"""
import json, sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check import TABLES, canon  # noqa: E402

import duckdb  # noqa: E402


def main(sf_dir, out_dir, out_json):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    res = {}
    for name, sql in sorted(oracle.items()):
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "spark_rows": 0, "oracle_rows": 0,
                 "err": None}
        try:
            grel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, grows = grel.columns, grel.fetchall()
            wrel = con.sql(sql)
            wcols, wrows = wrel.columns, wrel.fetchall()
            gc, gr = canon(grows, gcols)
            wc, wr = canon(wrows, wcols)
            entry["spark_rows"] = len(gr)
            entry["oracle_rows"] = len(wr)
            entry["rows_match"] = len(gr) == len(wr)
            entry["schema_match"] = gc == wc
            entry["hash_match"] = entry["schema_match"] and gr == wr
        except Exception as e:
            entry["err"] = str(e)[:300]
        res[name] = entry
    json.dump(res, open(out_json, "w"), indent=2)
    bad = [k for k, v in res.items()
           if not (v["rows_match"] and v["schema_match"] and v["hash_match"])]
    print(f"{len(res) - len(bad)} ok / {len(bad)} bad -> {out_json}")
    if bad:
        print("bad:", ", ".join(bad))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
