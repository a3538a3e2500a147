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
    `N payload...` frames where N counts payload BYTES (UTF-8), matching
    frame_octet_counting on the encode side.

    Implemented as an iterative walk in the HEX domain (2 hex chars per
    byte) via aggregate over a bounded index sequence — pure Column, no
    UDF, byte-accurate for multi-byte payloads. ``max_frames`` bounds the
    walk (frames beyond it are not emitted)."""
    # state: struct(rest: hex string, out: array<string>)
    h = F.hex(c.cast("binary"))
    init = F.struct(h.alias("rest"), F.array().cast("array<string>").alias("out"))

    def step(acc, _):
        rest = acc["rest"]
        # ASCII digits are 0x30-0x39, the separating space is 0x20
        nhex = F.regexp_extract(rest, r"^((?:3[0-9])+)20", 1)
        n = F.unhex(nhex).cast("string").try_cast("int")
        prefix = F.length(nhex) + 2  # hex chars consumed incl. the space
        have = (nhex != "") & (F.length(rest) >= n * 2 + prefix)
        frame = F.unhex(F.substring(rest, prefix + 1, n * 2)).cast("string")
        remaining = rest.substr(prefix + 1 + n * 2, F.length(rest))
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


def _hex_byte(hexstr: Column, pos: Column) -> Column:
    """Byte value at 0-based byte offset `pos` of a hex string."""
    return F.conv(F.substring(hexstr, pos * 2 + 1, 2), 16, 10).cast("int")


def varint_length_delimited_frames(
    c: Column, max_frames: int = 1024, as_string: bool = True
) -> Column:
    """Protobuf-style varint length-delimited framing
    (`lib/codecs/src/decoding/framing/varint_length_delimited.rs`):
    each frame is `<uvarint len><len bytes>`.

    Pure Column over a BINARY payload: the bytes walk happens on the hex
    encoding (Spark has no byte indexing on binary, but hex + conv is
    codegen-friendly). Varints are bounded to 4 bytes (frames < 256 MiB —
    the reference's default max frame is far below that). Returns
    array<string> (UTF-8 payloads) or array<binary>."""
    hexstr = F.hex(c)
    nbytes_total = (F.length(hexstr) / 2).cast("int")

    # state: struct(pos: int byte offset, out: array<string hex frames>)
    init = F.struct(
        F.lit(0).alias("pos"), F.array().cast("array<string>").alias("out")
    )

    def step(acc, _):
        pos = acc["pos"]
        b0 = _hex_byte(hexstr, pos)
        b1 = _hex_byte(hexstr, pos + 1)
        b2 = _hex_byte(hexstr, pos + 2)
        b3 = _hex_byte(hexstr, pos + 3)
        # uvarint: 7-bit little-endian groups, MSB = continuation
        n1 = b0 % 128
        n2 = n1 + (b1 % 128) * 128
        n3 = n2 + (b2 % 128) * 16384
        n4 = n3 + (b3 % 128) * 2097152
        vlen = (
            F.when(b0 < 128, 1)
            .when(b1 < 128, 2)
            .when(b2 < 128, 3)
            .when(b3 < 128, 4)
            .otherwise(F.lit(None))  # >4-byte varint: stop (oversize frame)
        )
        flen = (
            F.when(b0 < 128, n1)
            .when(b1 < 128, n2)
            .when(b2 < 128, n3)
            .otherwise(n4)
        )
        fits = (
            vlen.isNotNull()
            & (pos < nbytes_total)
            & (pos + vlen + flen <= nbytes_total)
        )
        frame_hex = F.substring(hexstr, (pos + vlen) * 2 + 1, flen * 2)
        return F.when(
            fits,
            F.struct(
                (pos + vlen + flen).alias("pos"),
                F.concat(acc["out"], F.array(frame_hex)).alias("out"),
            ),
        ).otherwise(
            F.struct(nbytes_total.alias("pos"), acc["out"].alias("out"))
        )

    frames_hex = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_frames)), init, step, lambda a: a["out"]
    )
    decode = (
        (lambda h: F.unhex(h).cast("string")) if as_string else (lambda h: F.unhex(h))
    )
    return F.transform(frames_hex, decode)


# ---- chunked GELF (lib/codecs/src/decoding/framing/chunked_gelf.rs) ----
# UDP GELF chunk: 0x1e 0x0f | 8-byte message id | seq (1B) | total (1B) |
# payload. Non-chunked datagrams carry the whole message.

GELF_MAGIC_HEX = "1E0F"
GELF_MAX_CHUNKS = 128  # GELF spec: seq/total are single bytes, max 128 chunks


def gelf_chunk_header(c: Column) -> Column:
    """Parse a (possibly chunked) GELF datagram payload (binary) into
    struct(is_chunk, msg_id hex, seq, total, payload_hex)."""
    h = F.hex(c)
    is_chunk = F.substring(h, 1, 4) == GELF_MAGIC_HEX
    return F.struct(
        is_chunk.alias("is_chunk"),
        F.when(is_chunk, F.substring(h, 5, 16)).alias("msg_id"),
        F.when(is_chunk, F.conv(F.substring(h, 21, 2), 16, 10).cast("int")).alias("seq"),
        F.when(is_chunk, F.conv(F.substring(h, 23, 2), 16, 10).cast("int")).alias(
            "total"
        ),
        F.when(is_chunk, F.substring(h, 25, F.length(h))).otherwise(h).alias(
            "payload_hex"
        ),
    )


def reassemble_chunked_gelf(
    df: DataFrame, payload_col: str, out_col: str = "message"
) -> DataFrame:
    """Chunked-GELF reassembly as a DataFrame program: chunks group by
    message id, sort by seq, concatenate; a message emits only when ALL
    `total` chunks arrived (the reference buffers per message id with a
    timeout — in batch the grouping IS the buffer; in streaming run this
    inside a watermarked groupBy so stragglers age out).

    One shuffle on (msg_id) — chunk groups are tiny (≤128 chunks), no
    skew: scales linearly."""
    hdr = df.select(gelf_chunk_header(F.col(payload_col)).alias("h"))
    plain = hdr.where(~F.col("h.is_chunk")).select(
        F.unhex(F.col("h.payload_hex")).cast("string").alias(out_col)
    )
    chunks = hdr.where(F.col("h.is_chunk"))
    joined = (
        chunks.groupBy(F.col("h.msg_id").alias("msg_id"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("h.seq").alias("seq"),
                                        F.col("h.payload_hex").alias("p")))
            ).alias("parts"),
            F.count(F.lit(1)).alias("n"),
            F.first(F.col("h.total")).alias("total"),
        )
        .where(F.col("n") == F.col("total"))
        .select(
            F.unhex(
                F.array_join(F.transform(F.col("parts"), lambda s: s["p"]), "")
            )
            .cast("string")
            .alias(out_col)
        )
    )
    return plain.unionByName(joined)


# ---- encode-side framing (lib/codecs/src/encoding/framing/) -------------

def frame_newline(lines: Column) -> Column:
    """array<string> → one newline-delimited payload (newline framer)."""
    return F.concat(F.array_join(lines, "\n"), F.lit("\n"))


def frame_octet_counting(line: Column) -> Column:
    """RFC6587 octet-counting: '<len> <frame>' — the syslog TCP encode
    framer. Counts BYTES of the UTF-8 form per the RFC; the decode walker
    (length_delimited_frames) is also byte-accurate (hex-domain walk), so
    encode→decode round-trips are exact for multi-byte payloads too."""
    s = line.cast("string")
    return F.concat(F.octet_length(s).cast("string"), F.lit(" "), s)


def frame_length_delimited(payload: Column) -> Column:
    """4-byte big-endian length prefix + payload (binary)."""
    b = payload.cast("binary")
    return F.concat(
        F.unhex(F.lpad(F.hex(F.octet_length(b)), 8, "0")), b
    )


def chunk_gelf(
    payload: Column, max_chunk_bytes: int = 8192, msg_id: Column | None = None
) -> Column:
    """Chunked-GELF ENCODE: payload (string/binary) → array<binary> of
    UDP datagrams — `\\x1e\\x0f` magic + 8-byte message id + seq + total
    + slice (GELF spec; inverse of reassemble_chunked_gelf). A payload
    within the budget emits one unchunked datagram. Pure Column: hex-
    domain slicing, explode downstream to send."""
    h = F.hex(payload.cast("binary"))
    nbytes = (F.length(h) / 2).cast("int")
    total = F.ceil(nbytes / F.lit(max_chunk_bytes)).cast("int")
    mid = (
        F.lpad(F.hex(msg_id.cast("long")), 16, "0")
        if msg_id is not None
        else F.lpad(F.hex(F.xxhash64(payload.cast("string"))), 16, "0")
    )
    chunk_hex_len = max_chunk_bytes * 2
    chunks = F.transform(
        F.sequence(F.lit(0), total - 1),
        lambda i: F.unhex(
            F.concat(
                F.lit(GELF_MAGIC_HEX),
                mid,
                F.lpad(F.hex(i), 2, "0"),
                F.lpad(F.hex(total), 2, "0"),
                F.substring(
                    h, (i * chunk_hex_len + 1).cast("int"), chunk_hex_len
                ),
            )
        ),
    )
    # GELF caps a message at 128 chunks; beyond that the 1-byte seq/total
    # header fields can't represent the count (lpad would silently truncate
    # the hex) — emit NULL so callers can route to a dropped output instead
    # of sending corrupt datagrams.
    return (
        F.when(total <= 1, F.array(payload.cast("binary")))
        .when(total > GELF_MAX_CHUNKS, F.lit(None).cast("array<binary>"))
        .otherwise(chunks)
    )


def frame_grpc(payload: Column) -> Column:
    """gRPC message framing (PUBLIC gRPC-over-HTTP2 wire spec): 1-byte
    compressed flag (0) + 4-byte big-endian length + payload. This is
    the framing an OTLP/gRPC body carries (src/sources/opentelemetry/
    grpc.rs receives it via tonic); with functions/protowire.py it
    yields the full OTLP-gRPC payload path without an HTTP/2 server."""
    b = payload.cast("binary")
    return F.concat(
        F.unhex(F.lit("00")),
        F.unhex(F.lpad(F.hex(F.octet_length(b)), 8, "0")),
        b,
    )


def grpc_message_frames(c: Column, max_frames: int = 1024) -> Column:
    """Concatenated gRPC frames → array<binary> payloads. Pure Column
    hex-domain walk (same shape as length_delimited_frames); only
    uncompressed frames (flag 0) are consumed — a compressed flag stops
    the walk, the the-rest-is-opaque contract."""
    h = F.hex(c.cast("binary"))
    init = F.struct(
        h.alias("rest"), F.array().cast("array<binary>").alias("out")
    )

    def step(acc, _):
        rest = acc["rest"]
        flag = F.substring(rest, 1, 2)
        n = F.conv(F.substring(rest, 3, 8), 16, 10).try_cast("int")
        have = (
            (F.length(rest) >= 10)
            & (flag == "00")
            & (F.length(rest) >= n * 2 + 10)
        )
        frame = F.unhex(F.substring(rest, 11, n * 2))
        remaining = rest.substr(n * 2 + 11, F.length(rest))
        return F.when(
            have,
            F.struct(
                remaining.alias("rest"),
                F.concat(acc["out"], F.array(frame)).alias("out"),
            ),
        ).otherwise(
            F.struct(F.lit("").alias("rest"), acc["out"].alias("out"))
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(max_frames)), init, step,
        lambda acc: acc["out"],
    )
