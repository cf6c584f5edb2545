#!/usr/bin/env python3
"""Dev tool: pin a deterministic graft.Verify output as a DuckDB golden
oracle — `SELECT ... FROM (VALUES ...)` with explicit casts matching the
Spark result schema (NOT shipped code; output is pasted into
graft/operators/GoldenOracles.scala after review against FIXTURES.md).

Usage: python3 tools/golden_oracle.py <verifyOutDir> <name> [<name> ...]
"""
import sys

import pyarrow.dataset as pads

DUCK_TYPE = {
    "int32": "INTEGER",
    "int64": "BIGINT",
    "double": "DOUBLE",
    "bool": "BOOLEAN",
    "string": "VARCHAR",
    "large_string": "VARCHAR",
}


def lit(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # NaN: repr gives 'nan', which DuckDB parses but the driver's
        # normalizer renders as 'NaN' — emit the normalized spelling
        if v != v:
            return "'NaN'"
        # quoted: a bare literal would parse as DECIMAL and round-trip to a
        # different double; VARCHAR -> DOUBLE casts exactly
        return "'" + repr(v) + "'"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def main():
    out_dir = sys.argv[1]
    for name in sys.argv[2:]:
        t = pads.dataset(f"{out_dir}/{name}").to_table()
        if t.num_rows == 0:
            sys.exit(f"{name}: zero rows — 'FROM (VALUES )' is invalid SQL; "
                     "a zero-row entry cannot be pinned as a golden oracle")
        unsupported = [f"{f.name}: {f.type}" for f in t.schema
                       if str(f.type) not in DUCK_TYPE]
        if unsupported:
            sys.exit(f"{name}: column types without a DUCK_TYPE mapping "
                     f"({', '.join(unsupported)}) — extend DUCK_TYPE with the "
                     "matching DuckDB cast before pinning")
        cols = t.column_names
        types = [DUCK_TYPE[str(f.type)] for f in t.schema]
        data = [t.column(c).to_pylist() for c in cols]
        rows = []
        for i in range(t.num_rows):
            rows.append("(" + ", ".join(lit(data[j][i]) for j in range(len(cols))) + ")")
        sel = ", ".join(
            f"CAST(c{j} AS {types[j]}) AS {c}" for j, c in enumerate(cols))
        tdef = ", ".join(f"c{j}" for j in range(len(cols)))
        order = ", ".join(cols)
        sql = (f"SELECT {sel} FROM (VALUES " + ", ".join(rows) +
               f") t({tdef}) ORDER BY {order}")
        print(f"--- {name} ({t.num_rows} rows, {len(sql)} chars)")
        print(sql)
        print()


if __name__ == "__main__":
    main()
