"""Batch sink execution: partitioned parquet writes (the KeyPartitioner
analog — vector src/sinks/util/partitioner.rs) and read-back."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def test_partitioned_parquet_sink_roundtrip(spark):
    from vector_spark.config.loader import build_topology, run_sinks

    with tempfile.TemporaryDirectory() as tmp:
        out_path = os.path.join(tmp, "out")
        topo = build_topology(
            spark,
            {
                "sources": {
                    "logs": {
                        "type": "values",
                        "rows": [
                            {"seq": i, "level": "error" if i % 2 else "info",
                             "msg": f"m{i}"}
                            for i in range(20)
                        ],
                    }
                },
                "transforms": {},
                "sinks": {
                    "out": {
                        "type": "parquet",
                        "inputs": ["logs"],
                        "path": out_path,
                        "partition_by": ["level"],
                    }
                },
            },
        )
        run_sinks(topo)
        # hive-style partition dirs (the template-key partitioner analog)
        assert sorted(
            d for d in os.listdir(out_path) if d.startswith("level=")
        ) == ["level=error", "level=info"]
        back = spark.read.parquet(out_path)
        assert back.count() == 20
        assert back.where(F.col("level") == "error").count() == 10
