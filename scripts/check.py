#!/usr/bin/env python3
"""Local replay of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Loads every table in <sfDir> as a DuckDB view, runs each oracle SQL from
<verifyOutDir>/oracle_sql.json, loads the Spark result parquet written by
graft.Verify, sorts columns by name + rows by all columns, and compares
cell-by-cell. Exact equality required (mirrors a hash compare); floats
are compared bit-exactly and a warning distinguishes "close" from
"wrong". Driver-side python only — the Scala library never imports this.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_spark_result(path):
    t = pq.read_table(path)
    return t


def canon(table: pa.Table):
    cols = sorted(table.column_names)
    t = table.select(cols)
    rows = [tuple(col[i].as_py() for col in t.columns) for i in range(t.num_rows)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def cells_equal(a, b):
    if a is None and b is None:
        return True, False
    if isinstance(a, float) and isinstance(b, float):
        if a == b or (math.isnan(a) and math.isnan(b)):
            return True, False
        close = math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
        return False, close
    return a == b, False


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            oracle = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        try:
            spark = load_spark_result(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        ocols, orows = canon(oracle)
        scols, srows = canon(spark)
        if ocols != scols:
            print(f"FAIL {name}: columns differ\n  oracle: {ocols}\n  spark:  {scols}")
            n_fail += 1
            continue
        otypes = {f.name: f.type for f in oracle.schema}
        stypes = {f.name: f.type for f in spark.schema}
        for c in ocols:
            if otypes[c] != stypes[c] and not (
                pa.types.is_timestamp(otypes[c]) and pa.types.is_timestamp(stypes[c])
            ):
                print(f"  WARN {name}.{c}: type oracle={otypes[c]} spark={stypes[c]}")
        if len(orows) != len(srows):
            print(f"FAIL {name}: row count oracle={len(orows)} spark={len(srows)}")
            for r in orows[:3]:
                print("  oracle:", r)
            for r in srows[:3]:
                print("  spark: ", r)
            n_fail += 1
            continue
        bad = []
        close_only = []
        for i, (orow, srow) in enumerate(zip(orows, srows)):
            for j, (a, b) in enumerate(zip(orow, srow)):
                eq, close = cells_equal(a, b)
                if not eq:
                    (close_only if close else bad).append((i, ocols[j], a, b))
        if bad or close_only:
            n_fail += 1
            print(f"FAIL {name}: {len(bad)} wrong, {len(close_only)} float-close cells")
            for i, c, a, b in (bad + close_only)[:6]:
                print(f"  row {i} col {c}: oracle={a!r} spark={b!r}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(orows)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
