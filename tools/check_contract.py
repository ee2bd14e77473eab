"""Simulate the driver's correctness gate: run each __spark_entry__ query
against its DuckDB oracle at sf0.01 and compare row counts, schemas and
order-insensitive values (floats rounded before hashing, like the driver).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from mindb_spark.session import get_spark

    spark = get_spark("contract-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:
            failures.append(name)
            results[name] = {"status": "err", "err": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"✗ {name:24s} ENTRY ERROR: {exc}")
            continue
        if name not in oracles:
            results[name] = {"status": "no_oracle", "rows": len(srows)}
            print(f"  {name:24s} rows={len(srows):6d}  (no oracle — rows-only check)")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:
            failures.append(name)
            results[name] = {"status": "oracle_err", "err": str(exc)[:300]}
            print(f"✗ {name:24s} ORACLE SQL ERROR: {exc}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append(name)
            results[name] = {"status": "schema_mismatch"}
            print(f"✗ {name:24s} SCHEMA  spark={sorted(scols)} oracle={sorted(ocols)}")
            continue
        s = canon([tuple(r) for r in srows], scols)
        o = canon(orows, ocols)
        if len(s) != len(o):
            failures.append(name)
            results[name] = {"status": "rows_mismatch", "spark": len(s), "oracle": len(o)}
            print(f"✗ {name:24s} ROWS    spark={len(s)} oracle={len(o)}")
            continue
        if s != o:
            failures.append(name)
            results[name] = {"status": "values_mismatch", "rows": len(s)}
            diff = [(a, b) for a, b in zip(s, o) if a != b][:3]
            print(f"✗ {name:24s} VALUES  first diffs: {diff}")
            continue
        results[name] = {"status": "pass", "rows": len(s)}
        print(f"✓ {name:24s} rows={len(s):6d}")

    out_path = os.environ.get("CONTRACT_JSON")
    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "results": results, "failures": failures},
                f,
                indent=1,
            )
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
