"""One-off mirror of the driver's compare at sf0.01 for a name subset.

Usage: python tests/driver_mirror_sf001.py [name ...]  (default: first 50)
Prints PASS/FAIL per query. Not a pytest file — the per-round gate runs
the full mirror at sf0.001 in tests/test_entry_oracle.py; this script
exists to pre-flight the driver's exact scale before a round ends.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from ibis_olap_aggregation_spark.session import (  # noqa: E402
    get_spark,
    release_query_caches,
)
from test_entry_oracle import normalize, run_oracle  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("driver-mirror")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = sys.argv[1:] or list(queries)[:50]
    n_fail = 0
    for name in names:
        try:
            sdf = queries[name](spark, SF_DIR).toPandas()
            if name not in oracles:
                print(f"SKIP(no_oracle) {name} rows={len(sdf)}")
                continue
            odf = run_oracle(oracles[name], SF_DIR)
            # the driver canonicalizes via a pandas column lexsort —
            # array/struct cells die there (unhashable type: 'list')
            for df, side in ((sdf, "spark"), (odf, "oracle")):
                if len(df):
                    try:
                        df.sort_values(by=sorted(df.columns))
                    except TypeError as exc:
                        raise AssertionError(
                            f"{side} result not driver-sortable: {exc}"
                        ) from exc
            assert len(sdf) == len(odf), f"rows {len(sdf)} != {len(odf)}"
            assert sorted(sdf.columns) == sorted(odf.columns), "schema"
            pd.testing.assert_frame_equal(
                normalize(sdf), normalize(odf), check_dtype=False, check_exact=True
            )
            print(f"PASS {name} rows={len(sdf)}")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
        finally:
            # wrapper-driven drain only fires at the NEXT query; drain
            # here so the sweep's last query doesn't pin its caches
            release_query_caches()
    print(f"done: {n_fail} failures / {len(names)} checked")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
