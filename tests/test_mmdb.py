"""MaxMind DB binary format: reader/writer round-trip, tree semantics,
and the Spark broadcast-enrichment path (reference
`src/enrichment_tables/mmdb.rs`, `geoip.rs` — reimplemented from the
public MaxMind-DB file-format spec)."""

from __future__ import annotations

import ipaddress
import os
import tempfile

import pytest

from vector_spark.functions.mmdb import MMDBReader, mmdb_enrich, mmdb_table, write_mmdb

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "geo.mmdb")

NETS = {
    "10.0.0.0/8": {"country": {"iso_code": "US"}, "location": {"latitude": 37.0}},
    "192.168.0.0/16": {"country": {"iso_code": "DE"}, "asn": 3320},
    "192.168.128.0/17": {"country": {"iso_code": "FR"}, "anycast": True},
}


@pytest.fixture(scope="module")
def db_path():
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "t.mmdb")
        write_mmdb(p, NETS)
        yield p


def test_metadata(db_path):
    r = MMDBReader.open(db_path)
    assert r.metadata["binary_format_major_version"] == 2
    assert r.metadata["record_size"] == 24
    assert r.metadata["ip_version"] == 4
    assert r.metadata["node_count"] == r.node_count > 0


def test_lookup_exact_and_miss(db_path):
    r = MMDBReader.open(db_path)
    assert r.lookup("10.1.2.3")["country"]["iso_code"] == "US"
    assert r.lookup("10.1.2.3")["location"]["latitude"] == 37.0
    assert r.lookup("1.1.1.1") is None
    # typed values survive the round-trip
    assert r.lookup("192.168.0.1")["asn"] == 3320
    assert r.lookup("192.168.200.1")["anycast"] is True


def test_overlapping_network_split(db_path):
    """A /17 carved out of a /16: the uncovered half keeps the /16 record
    (covering-leaf push-down, the spec's tree semantics)."""
    r = MMDBReader.open(db_path)
    assert r.lookup("192.168.1.1")["country"]["iso_code"] == "DE"
    assert r.lookup("192.168.129.1")["country"]["iso_code"] == "FR"
    ranges = r.ipv4_ranges()
    as_ip = lambda n: str(ipaddress.ip_address(n))
    spans = {(as_ip(lo), as_ip(hi)): v["country"]["iso_code"] for lo, hi, v in ranges}
    assert spans[("192.168.0.0", "192.168.127.255")] == "DE"
    assert spans[("192.168.128.0", "192.168.255.255")] == "FR"
    # ranges are disjoint and sorted
    flat = sorted(ranges)
    for (lo1, hi1, _), (lo2, _, _) in zip(flat, flat[1:]):
        assert hi1 < lo2


def test_ranges_cover_every_lookup(db_path):
    """ipv4_ranges() and lookup() agree — the exploded form IS the tree."""
    r = MMDBReader.open(db_path)
    for ip in ["10.0.0.0", "10.255.255.255", "192.168.0.0", "192.168.127.255",
               "192.168.128.0", "192.168.255.255", "9.255.255.255", "11.0.0.0"]:
        n = int(ipaddress.ip_address(ip))
        via_ranges = next(
            (v for lo, hi, v in r.ipv4_ranges() if lo <= n <= hi), None
        )
        assert via_ranges == r.lookup(ip)


def test_committed_fixture_lookup():
    """The committed fixture (scripts/make_mmdb_fixture.py) resolves the
    derived event IPs 10.X.0.1 to the expected countries."""
    r = MMDBReader.open(FIXTURE)
    assert r.metadata["database_type"] == "GeoLite2-City-Fixture"
    for ip, iso in [("10.0.0.1", "US"), ("10.32.0.1", "DE"), ("10.64.0.1", "FR"),
                    ("10.96.0.1", "JP"), ("10.128.0.1", "BR"), ("10.160.0.1", "IN"),
                    ("10.192.0.1", "GB"), ("10.199.0.1", "GB")]:
        assert r.lookup(ip)["country"]["iso_code"] == iso
    assert r.lookup("10.200.0.1") is None


def test_mmdb_table_and_enrich(spark, db_path):
    t = mmdb_table(spark, db_path)
    assert "country.iso_code" in t.columns and "lo" in t.columns
    df = spark.createDataFrame(
        [("e1", "10.9.9.9"), ("e2", "192.168.130.7"), ("e3", "203.0.113.5")],
        "id string, ip string",
    )
    out = mmdb_enrich(df, "ip", spark, db_path).orderBy("id").collect()
    assert [r["country.iso_code"] for r in out] == ["US", "FR", None]
    # broadcast join: no shuffle of the fact side
    plan = mmdb_enrich(df, "ip", spark, db_path)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_lookup_rows_carry_network_cidr(spark):
    """Enrichment lookup results include the matched range as a CIDR
    `network` field (the reference's "add network CIDR field to lookup
    results" enrichment-tables feature)."""
    import os

    from vector_spark.functions.mmdb import mmdb_enrich, mmdb_table

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "geo.mmdb")
    t = mmdb_table(spark, fixture)
    assert "network" in t.columns
    nets = [r["network"] for r in t.select("network").collect()]
    assert all("/" in n for n in nets)
    ev = spark.createDataFrame([("10.0.0.1",)], "ip string")
    j = mmdb_enrich(ev, "ip", spark, fixture)
    row = j.head()
    import ipaddress

    assert ipaddress.ip_address("10.0.0.1") in ipaddress.ip_network(
        row["network"])
