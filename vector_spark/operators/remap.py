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
    # Pass 1 — SEQUENTIAL ungated application. Each statement's error
    # flag materializes against the state the prior statements built
    # (VRL runs statements in order: `.t = parse_timestamp!(...);
    # .h = format_timestamp!(.t, ...)` must see `.t`); the upfront
    # flag-on-input shape this replaces could not resolve a
    # just-assigned field at all. Root columns an assignment overwrites
    # snapshot their PRE-PROGRAM value first, for the original-event
    # fallback and the dropped output.
    work = df
    flag_cols: list[str] = []
    orig_of: dict[str, str] = {}  # target ROOT column -> snapshot name
    for i, a in enumerate(assignments):
        if a.error_when is not None:
            fc = f"__vrl_err_{i}"
            work = work.withColumn(
                fc, F.coalesce(a.error_when, F.lit(False)))
            flag_cols.append(fc)
        root = path_segs(a.out)[0]
        if root in df.columns and root not in orig_of:
            oc = f"__vrl_orig_{len(orig_of)}"
            work = work.withColumn(oc, F.col(_quoted(root)))
            orig_of[root] = oc
        # a None expr is an explicit null assignment (`.x = null`)
        expr = a.expr if a.expr is not None else F.lit(None)
        work = _assign(work, a.out, expr)

    err: Column = F.lit(False)
    for fc in flag_cols:
        err = err | F.col(fc)
    work = work.withColumn(error_col, err)
    if flag_cols:
        work = work.drop(*flag_cols)

    # Pass 2 — gate per target ROOT: errored rows forward the ORIGINAL
    # value (`remap.rs:121-128`) when the program kept the column's
    # type; a RETYPE (.foo = split(.foo), int → name, ...) falls back
    # to typed-null-on-error (the two branches of one column cannot
    # carry two types in a column engine; documented delta). Fresh
    # columns are null on error (the original event had no such field).
    out = work
    roots_in_order = list(dict.fromkeys(
        path_segs(a.out)[0] for a in assignments))
    for root in roots_in_order:
        cur = F.col(_quoted(root))
        fallback: Column = F.lit(None)
        if root in orig_of:
            try:
                old_dt = out.schema[orig_of[root]].dataType
                new_dt = out.schema[root].dataType
                if old_dt == new_dt:
                    fallback = F.col(orig_of[root])
            except Exception:
                pass
        out = out.withColumn(
            root, F.when(F.col(error_col), fallback).otherwise(cur))
    if orig_of:
        out = out.drop(*orig_of.values())
    for c in drop or []:
        out = _unassign(out, c)

    result: dict[str, DataFrame] = {}
    if drop_on_error or reroute_dropped:
        result[""] = out.where(~F.col(error_col)).drop(error_col)
        if reroute_dropped:
            # the dropped output carries the ORIGINAL event (original
            # column values in the original order)
            sel = [
                F.col(_quoted(orig_of[c])).alias(c) if c in orig_of
                else F.col(_quoted(c))
                for c in df.columns
            ]
            result["dropped"] = work.where(F.col(error_col)).select(*sel)
    else:
        result[""] = out
    return result
