"""VRL internal-metrics functions — get_vector_metric /
find_vector_metrics / aggregate_vector_metrics.

Reference: `lib/vector-vrl/metrics/src/{get_vector_metric,
find_vector_metrics,aggregate_vector_metrics,common}.rs` — VRL
functions that search Vector's own internal metrics by name and tags
(tag values support a single `*` wildcard, common.rs:101-110), return
them as VRL objects (`metric_into_vrl`, common.rs:124-164: name /
tags-as-value-arrays / type / kind / value, with value null for
non-counter-non-gauge types), or aggregate matches with
sum/avg/max/min over counter+gauge values only
(aggregate_vector_metrics.rs:46-71).

Spark mapping: the reference resolves each call against a metrics
cache refreshed on an interval (common.rs `MetricsStorage.cache`).
Here resolution happens ONCE per plan build on the driver — a batch
plan sees one consistent snapshot, the same temporal granularity as a
cache interval — and the resolved metric rides the plan as a literal
Column. The storage feeds from the observability API's TopologyView
counters (api_server.py — the same numbers `vector top` serves) plus
anything the host `store()`s directly.

Deviation (documented): `avg` of zero matches returns null here; the
reference divides a NotNan sum by len=0, which is not a value its own
type admits.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column
from pyspark.sql import functions as F


def _tag_matches(metric_tags: dict, key: str, want: str) -> bool:
    """common.rs:101-110 — one `*` splits into prefix/suffix match."""
    have = metric_tags.get(key)
    if have is None:
        return False
    have = str(have)
    if "*" in want:
        prefix, _, suffix = want.partition("*")
        return have.startswith(prefix) and have.endswith(suffix)
    return have == want


class MetricsStorage:
    """Snapshot store of internal metrics: each entry is a dict
    {name, tags: {k: v}, type, kind, value}. `store()` replaces the
    snapshot (the reference's cache.store); `attach_view()` lets the
    observability TopologyView's live counters join every read."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._metrics: list[dict] = []
        self._view = None

    def store(self, metrics: list[dict]) -> None:
        with self._lock:
            self._metrics = list(metrics)

    def upsert(self, metrics: list[dict]) -> None:
        """Replace-or-add entries by metric name (engine-internal
        counters like the reload counters use this; snapshot `store`
        stays the cache-replacement path)."""
        names = {m.get("name") for m in metrics}
        with self._lock:
            self._metrics = [
                m for m in self._metrics if m.get("name") not in names
            ] + list(metrics)

    def attach_view(self, view) -> None:
        with self._lock:
            self._view = view

    def snapshot(self) -> list[dict]:
        with self._lock:
            out = list(self._metrics)
            view = self._view
        if view is not None:
            for component_id, counters in dict(view.counters).items():
                for field, value in dict(counters).items():
                    out.append({
                        "name": field,
                        "tags": {"component_id": component_id},
                        "type": "counter",
                        "kind": "incremental",
                        "value": float(value),
                    })
        return out

    def find_metrics(self, name: str, tags: dict | None) -> list[dict]:
        tags = tags or {}
        return [
            m for m in self.snapshot()
            if m.get("name") == name
            and all(_tag_matches(m.get("tags") or {}, k, str(v))
                    for k, v in tags.items())
        ]

    def get_metric(self, name: str, tags: dict | None) -> dict | None:
        found = self.find_metrics(name, tags)
        return found[0] if found else None


METRICS_STORAGE = MetricsStorage()


def _metric_lit(m: dict) -> Column:
    """metric_into_vrl (common.rs:124-164) as a literal struct Column:
    tags become {k: [v]} value-arrays, value is null unless the type
    is counter or gauge."""
    tags = m.get("tags") or {}
    if tags:
        tag_col = F.create_map(
            *[x for k, v in sorted(tags.items())
              for x in (F.lit(str(k)), F.array(F.lit(str(v))))]
        )
    else:
        tag_col = F.create_map().cast("map<string,array<string>>")
    mtype = str(m.get("type", "gauge"))
    value = (
        F.lit(float(m["value"]))
        if mtype in ("counter", "gauge") and m.get("value") is not None
        else F.lit(None).cast("double")
    )
    return F.struct(
        F.lit(str(m.get("name"))).alias("name"),
        tag_col.alias("tags"),
        F.lit(mtype).alias("type"),
        F.lit(str(m.get("kind", "absolute"))).alias("kind"),
        value.alias("value"),
    )


_EMPTY_METRIC_T = (
    "struct<name:string,tags:map<string,array<string>>,"
    "type:string,kind:string,value:double>"
)


def _as_tags(tags) -> dict | None:
    if tags is None or isinstance(tags, dict):
        return tags
    raise ValueError(
        "vector-metrics functions take tags as a literal object "
        "(driver-resolved; per-row tag expressions have no analog here)")


def get_vector_metric(key: str, tags=None) -> Column:
    m = METRICS_STORAGE.get_metric(str(key), _as_tags(tags))
    if m is None:
        return F.lit(None).cast(_EMPTY_METRIC_T)
    return _metric_lit(m)


def find_vector_metrics(key: str, tags=None) -> Column:
    found = METRICS_STORAGE.find_metrics(str(key), _as_tags(tags))
    if not found:
        return F.array().cast(f"array<{_EMPTY_METRIC_T}>")
    return F.array(*[_metric_lit(m) for m in found])


def aggregate_vector_metrics(function: str, key: str, tags=None) -> Column:
    fn = str(function)
    if fn not in ("sum", "avg", "min", "max"):
        raise ValueError(
            f"aggregate_vector_metrics: unknown function {fn!r} "
            "(sum/avg/min/max)")
    values = [
        float(m["value"])
        for m in METRICS_STORAGE.find_metrics(str(key), _as_tags(tags))
        if m.get("type") in ("counter", "gauge") and m.get("value") is not None
    ]
    if fn == "sum":
        return F.lit(float(sum(values)))
    if not values:
        return F.lit(None).cast("double")
    if fn == "avg":
        return F.lit(sum(values) / len(values))
    return F.lit(max(values) if fn == "max" else min(values))


VECTOR_METRICS_FNS = {
    "get_vector_metric": get_vector_metric,
    "find_vector_metrics": find_vector_metrics,
    "aggregate_vector_metrics": aggregate_vector_metrics,
}
