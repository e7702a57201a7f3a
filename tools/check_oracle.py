"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry AND its ``oracle_sql()`` on the same parquet
tables, compare row count, schema (arrow-normalized) and an
order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(pdf) -> str:
    import pandas as pd
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = []
    for tup in pdf.itertuples(index=False):
        cells = []
        for v in tup:
            if isinstance(v, float):
                cells.append(f"{v:.9g}")
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import __spark_entry__ as entrymod
    from igraph_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error {exc}")
            failures += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(spdf)} rows  "
                  f"({t_spark:.1f}s) cols={list(spdf.columns)}")
            continue
        t0 = time.time()
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {exc}")
            failures += 1
            continue
        t_duck = time.time() - t0
        ok_rows = len(spdf) == len(opdf)
        hs, ho = value_hash(spdf), value_hash(opdf)
        ok_vals = hs == ho
        status = "OK  " if (ok_rows and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status} {name}: spark={len(spdf)} duck={len(opdf)} "
              f"hash {'=' if ok_vals else '!='}  "
              f"({t_spark:.1f}s / {t_duck:.1f}s)")
        if not ok_vals and ok_rows:
            # show a sample diff to debug
            s = spdf.reindex(sorted(spdf.columns), axis=1) \
                .sort_values(sorted(spdf.columns)).head(3)
            o = opdf.reindex(sorted(opdf.columns), axis=1) \
                .sort_values(sorted(opdf.columns)).head(3)
            print("  spark:", s.to_dict("records"))
            print("  duck :", o.to_dict("records"))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
