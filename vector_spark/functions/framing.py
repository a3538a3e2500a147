"""Framing: byte/text streams → individual message frames
(reference `lib/codecs/src/decoding/framing/`, SURVEY §2.5).

Spark's file/kafka/socket sources already deliver newline-delimited
frames (that framing is the source's contract). This module covers the
rest as Column programs over a payload column: re-framing a blob into
rows is `explode(split(...))` — parallel per input row, no state.

Octet-counting (RFC6587 syslog) and chunked-GELF need cross-frame state
when frames span source records; within one record they are expressible
below. The cross-record form belongs to a custom PySpark DataSource
(round-2 note) — framing inside a record covers file/kafka payloads,
which arrive record-aligned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def newline_delimited(c: Column) -> Column:
    """Blob → array of lines (drop trailing empty frame)."""
    return F.filter(F.split(c, r"\r?\n"), lambda x: x != "")


def character_delimited(c: Column, delimiter: str) -> Column:
    """Blob → frames split on an arbitrary delimiter character/string."""
    import re

    return F.filter(F.split(c, re.escape(delimiter)), lambda x: x != "")


def length_delimited_frames(c: Column, max_frames: int = 1024) -> Column:
    """`<len> <payload>`-style octet-counting (RFC6587 syslog): parse
    `N payload...` frames where N counts payload characters.

    Implemented as an iterative substring walk via aggregate over a
    bounded index sequence — pure Column, no UDF. ``max_frames`` bounds
    the walk (frames beyond it are not emitted)."""
    # state: struct(rest: string, out: array<string>)
    init = F.struct(c.alias("rest"), F.array().cast("array<string>").alias("out"))

    def step(acc, _):
        rest = acc["rest"]
        n = F.regexp_extract(rest, r"^(\d+) ", 1)
        have = (n != "") & (F.length(rest) >= n.cast("int") + F.length(n) + 1)
        start = F.length(n) + 2  # 1-based, past "<n> "
        frame = F.substring(rest, start, n.try_cast("int"))
        remaining = rest.substr(start + n.try_cast("int"), F.length(rest))
        return F.when(
            have,
            F.struct(
                remaining.alias("rest"),
                F.concat(acc["out"], F.array(frame)).alias("out"),
            ),
        ).otherwise(F.struct(F.lit("").alias("rest"), acc["out"].alias("out")))

    walked = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_frames)), init, step, lambda acc: acc["out"]
    )
    return walked


def explode_frames(
    df: DataFrame, payload_col: str, frames: Column, out_col: str = "message"
) -> DataFrame:
    """Attach per-frame rows: one output row per frame, original columns
    preserved, frame order tracked in `frame_idx` (order matters to
    multiline/line_agg downstream)."""
    other = [c for c in df.columns if c != payload_col]
    return df.select(
        *other, F.posexplode(frames).alias("frame_idx", out_col)
    )
