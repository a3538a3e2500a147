"""Probe: is protobuf decode available in this container?

The reference's protobuf/OTLP/native codecs
(`lib/codecs/src/decoding/format/{protobuf,otlp,native}.rs`) need ONE of:
  1. the spark-protobuf jar (org.apache.spark:spark-protobuf_2.13) for
     JVM-side from_protobuf/to_protobuf, or
  2. the python `google.protobuf` package for a pandas-UDF decoder.

This script proves which are present. Run: python scripts/probe_protobuf.py
Exit 0 = protobuf available (implement the codec), exit 1 = unavailable
(the OTLP JSON encoding in functions/codecs.py remains the supported
OTLP path; protobuf stays documented as env-gated).
"""

from __future__ import annotations

import glob
import importlib.util
import os
import sys

sys.path.insert(0, ".")


def main() -> int:
    findings: list[str] = []
    ok = False

    spark_home = os.environ.get("SPARK_HOME", "/opt/spark")
    jars = glob.glob(os.path.join(spark_home, "jars", "*protobuf*.jar"))
    real = [j for j in jars if "spark-protobuf" in os.path.basename(j)]
    findings.append(
        f"spark-protobuf jar in {spark_home}/jars: "
        + (", ".join(real) if real else "ABSENT "
           f"(only shaded copies: {[os.path.basename(j) for j in jars]})")
    )
    ok = ok or bool(real)

    try:
        has_pyproto = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no `google` namespace package at all
        has_pyproto = False
    findings.append(f"python google.protobuf: {'present' if has_pyproto else 'ABSENT'}")
    ok = ok or has_pyproto

    # the pyspark wrapper module always imports; the real capability check
    # is invoking from_protobuf in a plan
    try:
        from pyspark.sql import functions as F
        from pyspark.sql.protobuf.functions import from_protobuf

        from vector_spark.session import get_spark

        spark = get_spark("protobuf-probe", cpus=2, shuffle_partitions=2)
        df = spark.createDataFrame([(b"\x08\x01",)], "payload binary")
        try:
            df.select(
                from_protobuf(
                    F.col("payload"), "Probe", binaryDescriptorSet=b"\x0a\x00"
                )
            ).collect()
            findings.append("from_protobuf plan: RESOLVED")
            ok = True
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            findings.append(f"from_protobuf plan: FAILED ({type(e).__name__}: {msg})")
            if "PROTOBUF" in msg.upper() and "NOT_LOADED" in msg.upper():
                findings.append("  → jar-missing error class confirms unavailability")
    except Exception as e:  # wrapper import itself failed
        findings.append(f"pyspark.sql.protobuf import: FAILED ({e})")

    print("\n".join(findings))
    print(f"\nVERDICT: protobuf decode {'AVAILABLE' if ok else 'UNAVAILABLE'} "
          "in this container")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
