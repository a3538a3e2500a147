"""`remap` transform — per-event program with error routing.

Reference: vector `src/transforms/remap.rs:55` — runs a VRL program per
event; on error or abort the event is dropped, kept unmodified, or routed
to a named `dropped` output (`drop_on_error` `:128`, `drop_on_abort`
`:142`, `reroute_dropped` `:50,:155`). The crucial fallibility contract
(`remap.rs:121-128`): when the program errors and events are NOT dropped,
the ORIGINAL event is forwarded unchanged.

Spark mapping: assignments are Column expressions evaluated in one
projection (Catalyst pipelines them; a VRL `del` is a drop, `.field`
paths are columns / struct fields). Fallibility: an assignment's error
condition is "source present but result null" (the `, err` convention
from functions.vrl.fallible); the per-event error flag is the OR of the
assignment error flags. The operator returns (ok, dropped) DataFrames
from the same parent — two filters Catalyst evaluates over one scan when
both are consumed in one action, mirroring route().
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _is_struct_col(df: DataFrame, name: str) -> bool:
    return name in df.columns and isinstance(df.schema[name].dataType, StructType)


def path_segs(name: str) -> list[str]:
    """Split a dotted path into segments, honoring backtick-quoted
    segments whose names contain dots ('a.`b.c`' → ['a', 'b.c'] — the
    VRL quoted-path form the compiler emits)."""
    segs: list[str] = []
    i = 0
    while i < len(name):
        if name[i] == "`":
            j = name.index("`", i + 1)
            segs.append(name[i + 1 : j])
            i = j + 2  # skip closing backtick + following dot
        else:
            j = name.find(".", i)
            # a dot inside backticks belongs to a later quoted segment
            bq = name.find("`", i)
            if bq != -1 and (j == -1 or bq < j):
                j = bq - 1  # plain run ends before the backtick's dot
                segs.append(name[i:j])
                i = j + 1
                continue
            segs.append(name[i:] if j == -1 else name[i:j])
            i = len(name) if j == -1 else j + 1
    return [s for s in segs if s != ""]


def _quoted(seg: str) -> str:
    return f"`{seg}`" if "." in seg or "`" in seg else seg


def _nested_exists(df: DataFrame, root: str, rest: list[str]) -> bool:
    """Does struct field root.rest exist in df's schema?"""
    if not _is_struct_col(df, root):
        return False
    dt = df.schema[root].dataType
    for part in rest:
        if not isinstance(dt, StructType) or part not in dt.fieldNames():
            return False
        dt = dt[part].dataType
    return True


def _nested_struct(parts: list[str], expr: Column) -> Column:
    """Build struct(… struct(expr AS last) … AS first) for a fresh path."""
    for part in reversed(parts):
        expr = F.struct(expr.alias(part))
    return expr


def _assign(df: DataFrame, name: str, expr: Column) -> DataFrame:
    """Path-aware assignment (VRL `.a.b = …` mutates the `a` object —
    vrl expressions/path.cue). An existing struct root mutates in place
    via withField; a missing root materializes a fresh nested struct; a
    non-struct root of the same name falls back to a flat dotted-name
    column (the documented legacy-envelope escape hatch)."""
    segs = path_segs(name)
    if len(segs) > 1:
        root, rest = segs[0], segs[1:]
        if _is_struct_col(df, root):
            return df.withColumn(
                root,
                F.col(_quoted(root)).withField(
                    ".".join(_quoted(s) for s in rest), expr
                ),
            )
        if root not in df.columns:
            return df.withColumn(root, _nested_struct(rest, expr))
        return df.withColumn(name, expr)  # legacy flat dotted-name column
    return df.withColumn(segs[0], expr)


def _unassign(df: DataFrame, name: str) -> DataFrame:
    """Path-aware del(.path): struct fields dropFields, columns drop."""
    segs = path_segs(name)
    if len(segs) > 1:
        root, rest = segs[0], segs[1:]
        if _nested_exists(df, root, rest):
            return df.withColumn(
                root,
                F.col(_quoted(root)).dropFields(
                    ".".join(_quoted(s) for s in rest)
                ),
            )
    return df.drop(segs[0] if len(segs) == 1 else name)


@dataclass
class Assignment:
    """One `path = expression` step. ``error_when`` marks fallibility:
    if None, the assignment is infallible (never errors)."""

    out: str
    expr: Column
    error_when: Column | None = None


def fallible_assignment(out: str, expr: Column, source: Column) -> Assignment:
    """VRL `out = fn!(source)` — errors when source is present but the
    expression could not produce a value."""
    return Assignment(out, expr, source.isNotNull() & expr.isNull())


def remap(
    df: DataFrame,
    assignments: list[Assignment],
    drop: list[str] | None = None,
    drop_on_error: bool = False,
    reroute_dropped: bool = False,
    error_col: str = "_error",
) -> dict[str, DataFrame]:
    """Apply assignments; route errored events per the reference contract.

    Returns {"": ok_df, "dropped": dropped_df?}:
    - no error handling (default): errored rows keep their ORIGINAL
      column values (`remap.rs:121-128`), un-errored rows get the new ones.
    - drop_on_error: errored rows are removed from the primary output.
    - reroute_dropped: errored rows (original values) appear on the
      `dropped` output instead of being discarded.
    """
    err: Column = F.lit(False)
    for a in assignments:
        if a.error_when is not None:
            err = err | F.coalesce(a.error_when, F.lit(False))

    tagged = df.withColumn(error_col, err)
    out = tagged
    for a in assignments:
        segs = path_segs(a.out)
        exists = (len(segs) == 1 and segs[0] in df.columns) or (
            a.out in df.columns
            or (len(segs) > 1 and _nested_exists(df, segs[0], segs[1:]))
        )
        if exists:
            # errored event forwards unchanged: keep original on error.
            # ONLY when the assignment keeps the column's type — when it
            # RETYPES (.foo = split(.foo), int → facility name, ...) the
            # two branches cannot share a type: analysis would coerce and
            # ANSI-cast at runtime, so retypes fall back to
            # typed-null-on-error (VRL's per-row dynamic retype has no
            # dual-type analog in a column engine; documented delta).
            same_type = False
            try:
                old_dt = out.select(F.col(a.out).alias("_o")).schema[0].dataType
                new_dt = out.select(a.expr.alias("_n")).schema[0].dataType
                same_type = old_dt == new_dt
            except Exception:
                same_type = False
            if same_type:
                value = F.when(F.col(error_col), F.col(a.out)).otherwise(
                    a.expr
                )
            else:
                value = F.when(F.col(error_col), F.lit(None)).otherwise(
                    a.expr
                )
        else:
            value = F.when(F.col(error_col), F.lit(None)).otherwise(a.expr)
        out = _assign(out, a.out, value)
    for c in drop or []:
        out = _unassign(out, c)

    result: dict[str, DataFrame] = {}
    if drop_on_error or reroute_dropped:
        result[""] = out.where(~F.col(error_col)).drop(error_col)
        if reroute_dropped:
            result["dropped"] = tagged.where(F.col(error_col)).drop(error_col)
    else:
        result[""] = out
    return result
