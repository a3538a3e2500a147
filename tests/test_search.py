"""Datadog-search condition dialect tests (vector src/conditions/)."""

from __future__ import annotations

from pyspark.sql import Row

from vector_spark.functions.search import datadog_search


def _ids(df, cond):
    return sorted(r.seq for r in df.where(cond).collect())


def test_search_basic_and_or(spark):
    df = spark.createDataFrame(
        [
            Row(seq=1, status="error", service="api", message="boom"),
            Row(seq=2, status="info", service="api", message="ok"),
            Row(seq=3, status="error", service="web", message="crash boom"),
        ]
    )
    assert _ids(df, datadog_search("status:error")) == [1, 3]
    assert _ids(df, datadog_search("status:error AND service:api")) == [1]
    assert _ids(df, datadog_search("status:error service:api")) == [1]  # adjacency=AND
    assert _ids(df, datadog_search("service:web OR status:info")) == [2, 3]
    assert _ids(df, datadog_search("-status:error")) == [2]
    assert _ids(df, datadog_search("NOT (status:error OR service:web)")) == [2]


def test_search_wildcard_quoted_default_field(spark):
    df = spark.createDataFrame(
        [
            Row(seq=1, service="api-gateway", message="request failed"),
            Row(seq=2, service="api-auth", message="login ok"),
            Row(seq=3, service="worker", message="request failed"),
        ]
    )
    assert _ids(df, datadog_search("service:api-*")) == [1, 2]
    assert _ids(df, datadog_search('message:"request failed"')) == [1, 3]
    assert _ids(df, datadog_search('"login ok"')) == [2]  # default field


def test_search_numeric_and_range(spark):
    df = spark.createDataFrame(
        [Row(seq=1, latency=10.0), Row(seq=2, latency=150.0), Row(seq=3, latency=99.0)]
    )
    assert _ids(df, datadog_search("latency:>100")) == [2]
    assert _ids(df, datadog_search("latency:<=99")) == [1, 3]
    assert _ids(df, datadog_search("latency:[50 TO 150]")) == [2, 3]


def test_search_reference_corpus(spark):
    """Cases adapted from the reference's own check corpus
    (src/conditions/datadog_search.rs get_checks()): _exists_/_missing_,
    @facet prefixes, tag-array resolution, escaped specials, exclusive
    ranges, boolean facets, negation in all three spellings."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("seq", T.IntegerType()),
            T.StructField("message", T.StringType()),
            T.StructField("a", T.StringType()),
            T.StructField("b", T.StringType()),
            T.StructField("flag", T.BooleanType()),
            T.StructField("lat", T.DoubleType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    rows = [
        (1, "bla", "bla", None, True, 10.0, ["a:foo", "env:prod"]),
        (2, "nothing", "va lue", "foo", False, 100.0, ["b:foo", "a-b:x"]),
        (3, "hello world", "va(lue", None, True, 250.0, ["env:dev", "n:7"]),
        (4, None, "va/lue", "bar", False, 50.0, ["n:42"]),
    ]
    df = spark.createDataFrame(rows, schema)
    cols = df.columns
    q = lambda s: sorted(
        r.seq for r in df.where(datadog_search(s, schema=cols)).collect()
    )

    # --- attribute existence (reference: "_exists_:@b" / "_missing_:@b")
    assert q("_exists_:@b") == [2, 4]
    assert q("NOT _exists_:@b") == [1, 3]
    assert q("-_exists_:@b") == [1, 3]
    assert q("_missing_:@b") == [1, 3]
    assert q("NOT _missing_:@b") == [2, 4]
    # --- tag existence ("_exists_:a" over the tags array; 'a' shadowed by
    #     column a here, so use tag-only names)
    assert q("_exists_:env") == [1, 3]
    assert q("_exists_:a-b") == [2]       # "- in tag name" reference case
    assert q("_missing_:env") == [2, 4]
    # --- keyword → default field ("bla" / NOT / -)
    assert q("bla") == [1]
    assert q("NOT bla") == [2, 3]         # null message (4) neither passes
    assert q("-bla") == [2, 3]
    assert q('"bla"') == [1]              # quoted keyword
    assert q('NOT "bla"') == [2, 3]
    # --- tag match ("env:prod" resolves via tags array)
    assert q("env:prod") == [1]
    assert q("NOT env:prod") == [2, 3, 4]
    assert q("-env:prod") == [2, 3, 4]
    assert q('env:"prod"') == [1]         # quoted tag match
    assert q("env:pro*") == [1]           # tag wildcard
    # --- boolean attribute match ("@a:true" form)
    assert q("@flag:true") == [1, 3]
    assert q("NOT @flag:false") == [1, 3]
    # --- escaped special characters in attribute values
    assert q(r"@a:va\ lue") == [2]
    assert q(r"@a:va\(lue") == [3]
    assert q("@a:va/lue") == [4]
    # --- numeric facet ranges incl. exclusive + unbounded
    assert q("@lat:[50 TO 100]") == [2, 4]
    assert q("@lat:{50 TO 250}") == [2]       # exclusive both ends
    assert q("@lat:[* TO 50]") == [1, 4]
    assert q("@lat:[200 TO *]") == [3]
    assert q("NOT @lat:[50 TO 100]") == [1, 3]
    # --- numeric range over tag values ("n:7", "n:42")
    assert q("n:[10 TO 50]") == [4]
    assert q("n:>6") == [3, 4]
    # --- boolean composition over mixed facet/tag terms
    assert q("(env:prod OR env:dev) AND @flag:true") == [1, 3]
    assert q("env:prod OR n:[40 TO 45]") == [1, 4]


def test_reserved_source_and_ddtags_multi_field(spark):
    """datadog_search.rs reserved-field semantics: `source:` matches
    source OR ddsource; a tag facet probes tags AND ddtags."""
    from vector_spark.functions.search import datadog_search

    df = spark.createDataFrame(
        [("nginx", None, ["env:prod"], None),
         (None, "agent", ["env:dev"], ["team:core"]),
         ("other", None, [], None)],
        "source string, ddsource string, "
        "tags array<string>, ddtags array<string>")
    schema = df.columns
    assert df.where(datadog_search("source:nginx", schema=schema)
                    ).count() == 1
    # matches via the ddsource column
    assert df.where(datadog_search("source:agent", schema=schema)
                    ).count() == 1
    # tag facet found in ddtags
    assert df.where(datadog_search("team:core", schema=schema)
                    ).count() == 1
    assert df.where(datadog_search("env:prod", schema=schema)
                    ).count() == 1
    assert df.where(datadog_search("env:nope", schema=schema)
                    ).count() == 0
