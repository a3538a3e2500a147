"""Generate the committed .mmdb test fixture (deterministic).

Covers the derived event IPs 10.X.0.1 (X = user_id % 200) used by the
geoip queries: seven /11-/13 country blocks with GeoLite2-City-shaped
records. Re-run to regenerate byte-identically.

Usage: python scripts/make_mmdb_fixture.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vector_spark.functions.mmdb import write_mmdb  # noqa: E402

NETWORKS = {
    "10.0.0.0/11":   {"country": {"iso_code": "US", "names": {"en": "United States"}},
                      "location": {"latitude": 37.0, "longitude": -97.0},
                      "city": {"names": {"en": "Kansas City"}}},
    "10.32.0.0/11":  {"country": {"iso_code": "DE", "names": {"en": "Germany"}},
                      "location": {"latitude": 51.0, "longitude": 9.0},
                      "city": {"names": {"en": "Kassel"}}},
    "10.64.0.0/11":  {"country": {"iso_code": "FR", "names": {"en": "France"}},
                      "location": {"latitude": 46.0, "longitude": 2.0},
                      "city": {"names": {"en": "Vierzon"}}},
    "10.96.0.0/11":  {"country": {"iso_code": "JP", "names": {"en": "Japan"}},
                      "location": {"latitude": 36.0, "longitude": 138.0},
                      "city": {"names": {"en": "Nagano"}}},
    "10.128.0.0/11": {"country": {"iso_code": "BR", "names": {"en": "Brazil"}},
                      "location": {"latitude": -10.0, "longitude": -55.0},
                      "city": {"names": {"en": "Sinop"}}},
    "10.160.0.0/11": {"country": {"iso_code": "IN", "names": {"en": "India"}},
                      "location": {"latitude": 20.0, "longitude": 77.0},
                      "city": {"names": {"en": "Nagpur"}}},
    "10.192.0.0/13": {"country": {"iso_code": "GB", "names": {"en": "United Kingdom"}},
                      "location": {"latitude": 54.0, "longitude": -2.0},
                      "city": {"names": {"en": "Lancaster"}}},
}

if __name__ == "__main__":
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "geo.mmdb")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    write_mmdb(out, NETWORKS, database_type="GeoLite2-City-Fixture")
    print(out, os.path.getsize(out), "bytes")
