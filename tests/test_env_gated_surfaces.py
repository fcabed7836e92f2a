"""Self-activating probes for surfaces blocked by THIS image, not by
the code: they skip with the documented reason today and turn
themselves on the round the environment heals — no manual re-probe
(PARITY has carried the manual note since round 3).

- transformWithStateInPandas (Spark 4 TWS StatefulProcessor): its
  driver worker imports google.protobuf, absent from the image. The
  stateful streaming surface ships on applyInPandasWithState until
  then; this smoke proves the TWS twin works the day it can.
- Avro source: built-in-but-external module, not deployed and no
  network to fetch it.
"""

from __future__ import annotations

import pytest


def test_transform_with_state_runs_when_protobuf_present(spark, tmp_path):
    pytest.importorskip(
        "google.protobuf",
        reason="TWS driver worker needs google.protobuf (broken in image"
        " since round 3; re-probed automatically here)",
    )
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [StructField("user_id", LongType()), StructField("total", LongType())]
    )

    class RunningTotal(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "total", StructType([StructField("t", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            total = self._state.get()[0] if self._state.exists() else 0
            for pdf in rows:
                total += int(pdf["v"].sum())
            self._state.update((total,))
            yield pd.DataFrame({"user_id": [key[0]], "total": [total]})

        def close(self) -> None:
            pass

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 10), (1, 5), (2, 7)], "user_id long, v long"
    ).write.parquet(src)
    stream = spark.readStream.schema("user_id long, v long").parquet(src)
    q = (
        stream.groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotal(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
        .writeStream.format("memory")
        .queryName("tws_probe")
        .outputMode("update")
        .start(checkpointLocation=str(tmp_path / "ckpt"))
    )
    try:
        q.processAllAvailable()
        got = {
            r["user_id"]: r["total"]
            for r in spark.sql("SELECT * FROM tws_probe").collect()
        }
    finally:
        q.stop()
    assert got == {1: 15, 2: 7}


def test_avro_roundtrip_when_module_deployed(spark, tmp_path):
    df = spark.range(5).selectExpr("id", "cast(id as string) AS s")
    path = str(tmp_path / "avro")
    try:
        df.write.format("avro").save(path)
    except Exception as exc:  # noqa: BLE001 - classify, then skip or fail
        if "Failed to find data source: avro" in str(exc):
            pytest.skip(
                "spark-avro module not deployed in image (documented in"
                " PARITY; auto-activates when present)"
            )
        raise
    back = spark.read.format("avro").load(path)
    assert sorted(tuple(r) for r in back.collect()) == [
        (i, str(i)) for i in range(5)
    ]
