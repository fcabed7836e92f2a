"""Empirical scale smoke for the EVENT-STREAM axis: the events table
feeds the windowing / sessionization / attribution / SCD2 / time-series
families, and (unlike facts, dims, corpus, embeddings and the graph) it
had no measured growth curve. Two axes:

- replica mode (default): amplify events Nx with remapped user_id and
  event_id — users grow Nx, per-user density is unchanged. Every
  user-partitioned window/session shape must grow ~linearly (more
  partitions, same partition size).
- density mode (``density D``): D copies per USER (event_id remapped,
  ts offset by k seconds so orderings stay unique) — per-user streams
  grow Dx while the user population is fixed. This is the window-state
  axis: per-user windows, session merges and SCD2 run-length
  compression see Dx longer partitions.

Usage:
  python tools/event_scale_smoke.py [amplification]   # replica mode
  python tools/event_scale_smoke.py density [D]       # density mode

Writes nothing to the repo; amplified parquet lives under /tmp.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.queries import QUERIES
from ibis_olap_aggregation_spark.session import (
    get_spark,
    load_table,
    release_query_caches,
)

SRC = "/root/testdata/sf0.1"

TIMED = [
    "events_session_window",
    "events_retention_cohorts",
    "events_attribution_last_touch",
    "events_burst_cap",
    "events_ewma_user_value",
    "scd2_point_in_time_join",
    "events_autocorrelation",
    # streaming replay twins (round 11): stateful dedup state is
    # KEY-sized, upsert snapshots are (user x type)-sized — both must
    # grow ~linearly on the replica axis
    "streaming_dedup_within_watermark_twin",
    "streaming_upsert_latest_state_twin",
    # round 12: survival estimator (user-grain aggs + day-grain window)
    # and the bounded-horizon eviction twin (state must stay flat on
    # the replica axis — more users, same horizon width per partition)
    "events_survival_kaplan_meier",
    "streaming_interval_join_eviction",
    # round-12 second batch: lookback attribution is one user-partitioned
    # window — must track the session-window line on the replica axis;
    # the custom-state twin's state is user-sized, so its drain must
    # grow ~linearly in events while state grows only with users
    "events_attribution_lookback",
    "streaming_running_totals_twin",
    # round 13: the one-scan chained-window funnel (user-partitioned —
    # linear on the replica axis) and the RFM cube, whose quintiles
    # come from the two-pass ranker: past 50k users the replica axis
    # drives it onto the REAL range-partitioned path (the tiny-input
    # single-window shortcut no longer applies)
    "events_funnel_conversion_rate",
    "events_rfm_segments",
    # round 14: the late-arriving SCD2 merge — three co-keyed passes
    # over the fact stream (base dim windows, affected-user semi/anti,
    # scoped rebuild windows); every shape is user-partitioned, so the
    # replica axis must stay ~linear, and the density axis stresses the
    # run-length compression on amp-x longer per-user partitions
    "scd2_late_arriving_update_merge",
    # round 14c: the join-free as-of — ONE user_id exchange + one sort
    # over the union of both sides, zero row amplification; the replica
    # axis must stay ~linear and the density axis stresses the per-user
    # sort on amp-x longer partitions
    "join_asof_backward",
]


def _mat(df) -> None:
    df.write.format("noop").mode("overwrite").save()
    release_query_caches()


def _time(fn, *args) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        _mat(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    density_mode = len(sys.argv) > 1 and sys.argv[1] == "density"
    amp = int(sys.argv[2]) if density_mode and len(sys.argv) > 2 else (
        int(sys.argv[1]) if not density_mode and len(sys.argv) > 1 else 10
    )
    spark = get_spark("event-scale-smoke")
    work = tempfile.mkdtemp(prefix="event_scale_")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        shutil.copy(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(work, f"{t}.parquet")
        )

    ev = load_table(spark, SRC, "events")
    max_eid = ev.agg(F.max("event_id")).first()[0] + 1
    max_uid = ev.agg(F.max("user_id")).first()[0] + 1
    ks = spark.range(amp).select(F.col("id").alias("k"))
    amped = ev.crossJoin(ks).withColumn(
        "event_id", F.col("event_id") + F.col("k") * max_eid
    )
    if density_mode:
        # same users, k-second ts offset keeps (ts, event_id) orders
        # unique; per-user stream grows amp-x
        amped = amped.withColumn(
            "ts", F.expr("ts + make_interval(0, 0, 0, 0, 0, 0, k)")
        )
        label = f"density x{amp}"
    else:
        amped = amped.withColumn(
            "user_id", F.col("user_id") + F.col("k") * max_uid
        )
        label = f"replicas x{amp}"
    # keyed repartition: one parquet file would otherwise become ONE
    # input partition downstream (the round-7 single-task cliff)
    amped.drop("k").repartition(32, "user_id").write.parquet(
        os.path.join(work, "events.parquet")
    )

    for d in (SRC, work):
        print(f"{d}: events = {load_table(spark, d, 'events').count()}")

    print(f"{'query':34s} {'base_s':>8s} {'amp_s':>8s} {'ratio':>6s}  ({label})")
    timed = TIMED
    only = os.environ.get("SPARK_GRAFT_SMOKE_ONLY")
    if only:
        timed = [n for n in TIMED if n in only.split(",")]
    for name in timed:
        fn = QUERIES[name]
        base_t = _time(fn, spark, SRC)
        amp_t = _time(fn, spark, work)
        print(f"{name:34s} {base_t:8.2f} {amp_t:8.2f} {amp_t / base_t:6.2f}")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

# Measured 2026-08-15 (local[32], shared VM), events 100k -> 1M (x10).
#
# Replica mode x10 (users x10, per-user density fixed): every ratio
# far below the x10 growth — the window/session families are
# partition-parallel and overhead-dominated at this scale:
#   query                              base_s    amp_s  ratio
#   events_session_window                0.63     0.66   1.05
#   events_retention_cohorts             0.77     1.01   1.30
#   events_attribution_last_touch        0.53     0.47   0.89
#   events_burst_cap                     0.45     0.72   1.61
#   events_ewma_user_value               0.38     0.28   0.73
#   scd2_point_in_time_join              0.78     0.85   1.09
#   events_autocorrelation               0.61     0.83   1.36
#
# Density mode x10 (fixed users, per-user streams x10 — the
# window-state axis):
#   query                              base_s    amp_s  ratio
#   events_session_window                0.65     0.61   0.95
#   events_retention_cohorts             0.80     1.16   1.45
#   events_attribution_last_touch        0.55     0.51   0.93
#   events_burst_cap                     0.40     0.79   1.98
#   events_ewma_user_value               0.36     0.36   1.02
#   scd2_point_in_time_join              0.76     0.76   1.00
#   events_autocorrelation               0.49     0.62   1.25
# Nothing superlinear on either axis; per-user window state (EWMA's
# sequential fold, SCD2 run compression, session merge) absorbs 10x
# longer streams at flat cost.

# Round 11 (2026-08-15), streaming replay twins on the replica axis
# (events 100k -> 1M, users x10; 8 micro-batches either way):
#   streaming_dedup_within_watermark_twin     8.05     9.70   1.21
#   streaming_upsert_latest_state_twin        8.52    10.88   1.28
# Both far below the x10 data growth — the fixed batch structure
# dominates and the per-batch state work (key-sized dedup state,
# (user x type)-sized upsert snapshots) grows gracefully.
#
# Round 12 (2026-08-15), replica x10 (events 100k -> 1M, users x10):
#   events_survival_kaplan_meier         1.27     1.39   1.10
#   streaming_interval_join_eviction    34.16    37.51   1.10
# The eviction twin's 1.10x is the bounded-state story end-to-end: 10x
# the stream, same horizon width per partition, near-flat wall time
# (the unbounded twin's state would grow 10x with the data).
