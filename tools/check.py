#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare against the Verify parquet dump
(columns sorted by name, rows sorted by all columns, exact value compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, math, os, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            # ONE execution per side: .columns/.types are relation
            # metadata (no execution), .fetchall() executes — the type
            # check below must not re-run the expensive oracles
            grel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, gtypes_l = grel.columns, [str(t) for t in grel.types]
            grows = grel.fetchall()
            wrel = con.sql(sql)
            wcols, wtypes_l = wrel.columns, [str(t) for t in wrel.types]
            wrows = wrel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
            n_fail += 1
            continue
        gc, gr = canon(grows, gcols)
        wc, wr = canon(wrows, wcols)
        if gc != wc:
            print(f"FAIL {name}: schema {gc} != {wc}")
            n_fail += 1
            continue
        # Physical-type-CLASS mirror of the driver's hash canonicalization:
        # an oracle that leaves sum()/count()/`//` un-cast returns HUGEINT
        # (decimal-class in arrow) where Spark wrote BIGINT and the driver
        # hash-mismatches even when every value is equal — the x61 red row
        # in round 7. The driver is observed to TOLERATE integer-width
        # differences (7 r7-green queries pair Spark INT32 ranks with
        # DuckDB BIGINT) but not class changes (int → hugeint/decimal), so
        # compare by class: all machine ints are one class, all binary
        # floats another, everything else (HUGEINT, DECIMAL, VARCHAR,
        # dates, lists, ...) by exact type string.
        def tclass(t):
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                     "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
                return "int"
            if t in ("FLOAT", "DOUBLE"):
                return "float"
            return t
        gtypes = dict(zip(gcols, [tclass(t) for t in gtypes_l]))
        wtypes = dict(zip(wcols, [tclass(t) for t in wtypes_l]))
        tbad = [(c, gtypes[c], wtypes[c]) for c in gc if gtypes[c] != wtypes[c]]
        if tbad:
            print(f"FAIL {name}: physical types differ (spark vs oracle): "
                  f"{tbad}")
            n_fail += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(gr, wr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(gr)} rows differ; first: "
                  f"{bad[0][0]} != {bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    # every gated query has a full oracle — no rows-only checks remain.
    # The artifact check runs BEFORE the summary line so the established
    # "== N pass / M fail" signal never reads clean on a failing run.
    n_fail += untracked_artifacts()
    print(f"== {n_pass} pass / {n_fail} fail (of {len(oracle)} oracled)")
    return 1 if n_fail else 0


def untracked_artifacts():
    """Round artifacts must live in the history they describe (r8 verdict
    #5, third round running): fail the local gate when BENCH_*/
    CORRECTNESS_*/LEAKCHECK files sit untracked or modified in the repo
    this script runs from."""
    import subprocess
    try:
        out = subprocess.run(
            ["git", "status", "--porcelain"], capture_output=True,
            text=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))).stdout
    except Exception as e:
        print(f"WARN artifact check skipped: {e}")
        return 0
    bad = [l for l in out.splitlines()
           if any(p in l for p in ("BENCH_", "CORRECTNESS_", "LEAKCHECK"))]
    if bad:
        print("FAIL round artifacts not committed:")
        for l in bad:
            print(f"  {l}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
