"""Vector sink templates — ``{{ field }}`` references + strftime items.

Reference: `src/template/mod.rs` (parse regex `\\{\\{(?P<key>[^\\}]+)\\}\\}`,
`:44`) and `src/template/parsing.rs` (``Part::Literal | Strftime | Reference``).
Semantics to preserve:

- ``{{ some.field }}`` renders the event field's value; a missing/null field
  is a *render error* and the reference drops (and errors) the event
  (`TemplateRenderingError::MissingKeys`). Spark analog: the rendered Column
  is NULL whenever any referenced field is NULL — callers drop/route those
  rows (``F.concat`` is already null-propagating, which gives us this for
  free).
- Literal text containing strftime items (``%Y-%m-%d``…) renders from the
  EVENT's timestamp, not wall clock (`parsing.rs::parse_literal` →
  `Part::Strftime`).
- Everything else is copied verbatim.

Spark-first design: a template compiles ONCE to a Column expression
(concat of literals, casts, and date_format calls) — rendering is
JVM-side, codegen'd, zero Python per row.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_REF_RE = re.compile(r"\{\{(?P<key>[^\}]+)\}\}")

# chrono strftime specifier → java.time DateTimeFormatter pattern
# (the subset that appears in real vector configs; extend as needed).
_STRFTIME_TO_JAVA = {
    "Y": "yyyy",
    "y": "yy",
    "m": "MM",
    "d": "dd",
    "e": "d",
    "H": "HH",
    "I": "hh",
    "M": "mm",
    "S": "ss",
    "p": "a",
    "a": "EEE",
    "A": "EEEE",
    "b": "MMM",
    "h": "MMM",
    "B": "MMMM",
    "j": "DDD",
    "F": "yyyy-MM-dd",
    "T": "HH:mm:ss",
    "D": "MM/dd/yy",
    "R": "HH:mm",
    "z": "Z",
    "3f": "SSS",
}


class TemplateParseError(ValueError):
    pass


def strftime_to_java(fmt: str) -> str:
    """Translate a chrono strftime string to a java.time pattern.

    Literal runs are single-quoted (java.time treats bare letters as
    pattern characters); ``%%`` renders a literal percent; ``%s`` (epoch
    seconds) is handled by the caller as a special token.
    """
    out: list[str] = []
    i = 0
    lit: list[str] = []

    def flush_literal():
        if lit:
            chunk = "".join(lit)
            if re.search(r"[A-Za-z']", chunk):
                out.append("'" + chunk.replace("'", "''") + "'")
            else:
                out.append(chunk)
            lit.clear()

    while i < len(fmt):
        c = fmt[i]
        if c != "%":
            lit.append(c)
            i += 1
            continue
        if i + 1 >= len(fmt):
            raise TemplateParseError(f"dangling % in strftime: {fmt!r}")
        nxt = fmt[i + 1]
        if nxt == "%":
            lit.append("%")
            i += 2
            continue
        spec = fmt[i + 1 : i + 3] if fmt[i + 1 : i + 3] in _STRFTIME_TO_JAVA else nxt
        if spec not in _STRFTIME_TO_JAVA:
            raise TemplateParseError(f"unsupported strftime item %{nxt} in {fmt!r}")
        flush_literal()
        out.append(_STRFTIME_TO_JAVA[spec])
        i += 1 + len(spec)
    flush_literal()
    return "".join(out)


def _has_strftime(s: str) -> bool:
    i = 0
    while i < len(s) - 1:
        if s[i] == "%":
            if s[i + 1] == "%":
                i += 2
                continue
            return True
        i += 1
    return False


def parse_template(src: str) -> list[tuple[str, str]]:
    """Split a template into ``[(kind, text)]`` with kind in
    ``literal | strftime | field`` (mirrors `parsing.rs::Part`)."""
    parts: list[tuple[str, str]] = []
    pos = 0
    for m in _REF_RE.finditer(src):
        if m.start() > pos:
            chunk = src[pos : m.start()]
            parts.append(("strftime" if _has_strftime(chunk) else "literal", chunk))
        parts.append(("field", m.group("key").strip()))
        pos = m.end()
    if pos < len(src):
        chunk = src[pos:]
        parts.append(("strftime" if _has_strftime(chunk) else "literal", chunk))
    return parts


def is_dynamic(src: str) -> bool:
    return any(k != "literal" for k, _ in parse_template(src))


def template_column(src: str, ts_col: str = "ts") -> Column:
    """Compile a template to ONE Column. NULL result ⇔ render error
    (a referenced field was NULL), matching the reference's
    MissingKeys-drops-the-event contract."""
    cols: list[Column] = []
    for kind, text in parse_template(src):
        if kind == "literal":
            cols.append(F.lit(text.replace("%%", "%")))
        elif kind == "field":
            cols.append(F.col(text).cast("string"))
        else:  # strftime
            if "%s" in text.replace("%%", ""):
                # epoch seconds has no java pattern — splice unix_timestamp
                for j, piece in enumerate(re.split(r"(?<!%)%s", text)):
                    if j:
                        cols.append(
                            F.unix_timestamp(F.col(ts_col)).cast("string")
                        )
                    if piece:
                        cols.append(
                            F.date_format(F.col(ts_col), strftime_to_java(piece))
                            if _has_strftime(piece)
                            else F.lit(piece.replace("%%", "%"))
                        )
            else:
                cols.append(F.date_format(F.col(ts_col), strftime_to_java(text)))
    if not cols:
        return F.lit("")
    return F.concat(*cols) if len(cols) > 1 else cols[0].cast("string")


def template_path_segments(src: str, ts_col: str = "ts") -> tuple[str, list[Column]]:
    """Split a PATH template on ``/`` into a static prefix (leading
    all-literal segments — these stay in the sink's base path so partition
    pruning still sees a fixed root) plus one compiled Column per remaining
    segment. Used by the partitioned sink (`src/sinks/util/partitioner.rs:60-81`
    KeyPartitioner analog)."""
    segments = [s for s in src.split("/") if s != ""]
    static: list[str] = []
    i = 0
    while i < len(segments) and not is_dynamic(segments[i]):
        static.append(segments[i])
        i += 1
    dynamic = [template_column(s, ts_col=ts_col) for s in segments[i:]]
    return "/".join(static), dynamic
