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


# ---- {{ field }} / strftime key templates ------------------------------
# vector src/template/mod.rs + src/sinks/util/partitioner.rs:60-81

def test_template_column_renders_fields_and_strftime(spark):
    from vector_spark.functions.template import template_column

    df = spark.createDataFrame(
        [("web-1", "2024-03-05 06:07:08", "a"), (None, "2024-03-05 06:07:08", "b")],
        "host string, ts_s string, id string",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    out = df.select(
        template_column("logs-{{ host }}-%Y/%m/%d").alias("k"), "id"
    ).collect()
    by_id = {r.id: r.k for r in out}
    assert by_id["a"] == "logs-web-1-2024/03/05"
    # missing field => NULL (the reference's MissingKeys render error)
    assert by_id["b"] is None


def test_template_strftime_epoch_and_literal_percent(spark):
    from vector_spark.functions.template import template_column

    df = spark.createDataFrame(
        [("2024-03-05 06:07:08",)], "ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    row = df.select(
        template_column("p=100%%/s=%s/d=%F").alias("k")
    ).collect()[0]
    import datetime
    epoch = int(
        datetime.datetime(2024, 3, 5, 6, 7, 8, tzinfo=datetime.timezone.utc)
        .astimezone()
        .timestamp()
    )
    # session tz is UTC in tests; compute epoch via Spark to stay tz-robust
    epoch = df.select(F.unix_timestamp("ts")).collect()[0][0]
    assert row.k == f"p=100%/s={epoch}/d=2024-03-05"


def test_write_templated_layout_and_drops(spark):
    from vector_spark.sinks import write_templated

    with tempfile.TemporaryDirectory() as tmp:
        df = spark.createDataFrame(
            [
                ("web-1", "2024-03-05 06:07:08", 1),
                ("web-1", "2024-03-06 06:07:08", 2),
                ("db-9", "2024-03-05 06:07:08", 3),
                (None, "2024-03-05 06:07:08", 4),  # render error -> dropped
            ],
            "host string, ts_s string, seq int",
        ).withColumn("ts", F.to_timestamp("ts_s"))
        res = write_templated(
            df, tmp, "s3-style/{{ host }}/dt=%Y-%m-%d", fmt="parquet"
        )
        assert res["dropped"] == 1
        root = os.path.join(tmp, "s3-style")
        assert sorted(
            d for d in os.listdir(root) if not d.startswith(("_", "."))
        ) == ["db-9", "web-1"]
        assert sorted(os.listdir(os.path.join(root, "web-1"))) == [
            "dt=2024-03-05",
            "dt=2024-03-06",
        ]
        back = spark.read.parquet(os.path.join(root, "web-1", "dt=2024-03-05"))
        assert [r.seq for r in back.collect()] == [1]


def test_templated_sink_via_topology_yaml(spark):
    from vector_spark.config.loader import load_topology, run_sinks

    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "out")
        topo = load_topology(
            spark,
            f"""
sources:
  logs:
    type: values
    rows:
      - {{seq: 1, host: "a", ts_s: "2024-01-02 03:04:05"}}
      - {{seq: 2, host: "b", ts_s: "2024-01-03 03:04:05"}}
transforms:
  stamped:
    type: remap
    inputs: [logs]
    assign:
      ts: "to_timestamp(ts_s)"
sinks:
  s3:
    type: parquet
    inputs: [stamped]
    path: "{out}"
    path_template: "svc/{{{{ host }}}}/dt=%F"
""",
        )
        results = run_sinks(topo)
        assert results["s3"]["dropped"] == 0
        assert os.path.isdir(os.path.join(out, "svc", "a", "dt=2024-01-02"))
        assert os.path.isdir(os.path.join(out, "svc", "b", "dt=2024-01-03"))


def test_write_templated_rejects_path_traversal(spark):
    """A key value containing '..' segments must not escape base_path
    during the hive-prefix rename pass (ADVICE r2)."""
    from vector_spark.sinks import write_templated

    with tempfile.TemporaryDirectory() as tmp:
        base = os.path.join(tmp, "base")
        os.makedirs(base)
        df = spark.createDataFrame(
            [("../../escape", 1), ("ok-key", 2)], "key string, seq int"
        )
        write_templated(df, base, "out/{{ key }}", fmt="parquet")
        # nothing written outside base
        assert sorted(d for d in os.listdir(tmp)) == ["base"]
        root = os.path.join(base, "out")
        names = sorted(d for d in os.listdir(root) if not d.startswith(("_", ".")))
        assert "escape" in names and "ok-key" in names
        assert ".." not in names
