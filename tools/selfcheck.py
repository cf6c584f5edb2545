#!/usr/bin/env python3
"""Dev-loop oracle check (mimics the driver's DuckDB compare; NOT shipped code).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Loads each <name>/ parquet produced by graft.Verify, runs the matching
oracle_sql.json query in DuckDB against the raw testdata parquet, and
compares schemas + sorted values exactly.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return str(v)


def rows_of(table):
    cols = sorted(table.column_names)
    pydict = {c: table.column(c).to_pylist() for c in cols}
    n = table.num_rows
    return [tuple(norm(pydict[c][i]) for c in cols) for i in range(n)], cols


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            mine = pads.dataset(f"{out_dir}/{name}").to_table()
            theirs = con.execute(sql).arrow()
            mrows, mcols = rows_of(mine)
            trows, tcols = rows_of(theirs)
            if mcols != tcols:
                print(f"FAIL {name}: columns {mcols} vs {tcols}")
                n_fail += 1
                continue
            if sorted(mrows) != sorted(trows):
                print(f"FAIL {name}: {len(mrows)} vs {len(trows)} rows")
                sm, st = sorted(mrows), sorted(trows)
                shown = 0
                for i in range(min(len(sm), len(st))):
                    if sm[i] != st[i]:
                        print(f"  first diff at sorted row {i}:")
                        print(f"    mine:   {sm[i]}")
                        print(f"    oracle: {st[i]}")
                        shown += 1
                        if shown >= 3:
                            break
                n_fail += 1
                continue
            # schema check (arrow types after parquet roundtrip)
            mt = {f.name: str(f.type) for f in mine.schema}
            tt = {f.name: str(f.type) for f in theirs.schema}
            if mt != tt:
                print(f"WARN {name}: schema {mt} vs {tt} (values match)")
            print(f"PASS {name} ({len(mrows)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
