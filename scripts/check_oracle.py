"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB, compare row count, sorted
column names, and an order-insensitive value hash. Usage:

    python scripts/check_oracle.py [sf_dir] [key ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from wikidata_qrank_spark.session import get_session  # noqa: E402
from wikidata_qrank_spark.sources.tables import TABLES  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        "\x1f".join("" if r[i] is None else str(r[i]) for i in order) for r in rows
    )
    return hashlib.md5("\x1e".join(canon).encode()).hexdigest()


def norm(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_session("oracle-check", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    if only:
        unknown = only - set(qs)
        if unknown:
            raise SystemExit(f"unknown query keys: {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in only}
    sqls = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir)
        scols = sorted(sdf.columns)
        srows = [tuple(norm(v) for v in r) for r in sdf.collect()]
        if name not in sqls:
            print(f"{name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        res = con.execute(sqls[name])
        dcols = [d[0] for d in res.description]
        drows = [tuple(norm(v) for v in r) for r in res.fetchall()]
        ok_cols = scols == sorted(dcols)
        ok_rows = len(srows) == len(drows)
        ok_hash = value_hash(srows, sdf.columns) == value_hash(drows, dcols)
        status = "OK" if (ok_cols and ok_rows and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(
                f"{name}: {status} cols={ok_cols} ({scols} vs {sorted(dcols)}) "
                f"rows={len(srows)}/{len(drows)} hash={ok_hash}"
            )
            if ok_cols and not ok_hash:
                s_set = set(srows)
                d_set = set(drows)
                print("  spark-only:", list(s_set - d_set)[:5])
                print("  duck-only:", list(d_set - s_set)[:5])
        else:
            print(f"{name}: OK rows={len(srows)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
