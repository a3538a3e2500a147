"""Adaptive Request Concurrency (ARC) — the reference's
`request.concurrency: adaptive` AIMD controller
(src/sinks/util/adaptive_concurrency/controller.rs), re-expressed in
vector_spark.arc for per-partition senders."""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from vector_spark.arc import AdaptiveController, _EwmaVar, send_all_adaptive


def test_ewma_var_reference_vector():
    """lib/vector-common/src/stats/mod.rs test: alpha 0.5, updates
    2.0, 2.0, 1.0 → mean 1.5, variance 0.25."""
    e = _EwmaVar(0.5)
    assert e.state is None
    assert e.update(2.0) == (2.0, 0.0)
    assert e.update(2.0) == (2.0, 0.0)
    mean, var = e.update(1.0)
    assert mean == pytest.approx(1.5)
    assert var == pytest.approx(0.25)


def test_additive_increase_on_fast_rtts():
    """Limit reached + no back pressure + current RTT <= past mean →
    +1 per RTT period (controller.rs manage_limit, first arm)."""
    c = AdaptiveController()
    assert c.current_limit == 1
    c._past_rtt.update(0.010)  # past mean 10 ms
    for want in (2, 3, 4):
        c._next_update = 0.0  # force management on this response
        with c._cond:
            c.in_flight = 1
        c._reached_limit = True
        start = time.monotonic() - 0.005  # 5 ms RTT, under the mean
        c.adjust(start, backpressure=False, use_rtt=True)
        assert c.current_limit == want


def test_multiplicative_decrease_on_backpressure():
    """Back pressure in an interval → limit × 0.9 floor, min 1."""
    c = AdaptiveController()
    c.current_limit = 50
    c._past_rtt.update(0.01)
    c._next_update = 0.0  # force the management path on next adjust
    start = time.monotonic() - 0.01
    with c._cond:
        c.in_flight = 1
    c.adjust(start, backpressure=True, use_rtt=False)
    assert c.current_limit == 45  # floor(50 * 0.9)


def test_fixed_concurrency_never_adapts():
    c = AdaptiveController(concurrency=4)
    assert c.current_limit == 4
    c._past_rtt.update(0.01)
    c._next_update = 0.0
    with c._cond:
        c.in_flight = 1
    c.adjust(time.monotonic() - 1.0, backpressure=True, use_rtt=False)
    assert c.current_limit == 4


def test_acquire_blocks_at_limit():
    c = AdaptiveController(concurrency=2)
    c.acquire()
    c.acquire()
    blocked = threading.Event()
    passed = threading.Event()

    def third():
        blocked.set()
        c.acquire()
        passed.set()

    threading.Thread(target=third, daemon=True).start()
    assert blocked.wait(2)
    time.sleep(0.2)
    assert not passed.is_set()  # still gated at limit 2
    c.adjust(time.monotonic(), backpressure=False, use_rtt=True)
    assert passed.wait(2)


def test_send_all_adaptive_delivers_and_retries_backpressure():
    """A flaky sender (first attempt of each body 429s) still delivers
    everything; a permanent 400 fails the call immediately."""
    attempts: dict[int, int] = {}
    delivered: list[int] = []
    lock = threading.Lock()

    class BP(Exception):
        pass

    def send_one(i):
        with lock:
            attempts[i] = attempts.get(i, 0) + 1
            if attempts[i] == 1:
                raise BP()
            delivered.append(i)

    ctrl = AdaptiveController(concurrency=4)
    n = send_all_adaptive(
        list(range(20)), send_one, ctrl,
        lambda e: isinstance(e, BP))
    assert n == 20
    assert sorted(delivered) == list(range(20))

    def send_bad(_i):
        raise ValueError("permanent")

    with pytest.raises(ValueError, match="permanent"):
        send_all_adaptive([1, 2, 3], send_bad,
                          AdaptiveController(concurrency=2),
                          lambda e: False)


@pytest.fixture()
def slow_server():
    """Capture server with a configurable artificial delay and an
    optional 429-every-Nth behavior."""
    state = {"delay": 0.0, "fail_every": 0, "n": 0}
    bodies: list[bytes] = []
    peak = {"in_flight": 0, "max": 0, "first": None, "last": None}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            with lock:
                state["n"] += 1
                n = state["n"]
                peak["in_flight"] += 1
                peak["max"] = max(peak["max"], peak["in_flight"])
                if peak["first"] is None:
                    peak["first"] = time.monotonic()
            try:
                time.sleep(state["delay"])
                ln = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(ln)
                if state["fail_every"] and n % state["fail_every"] == 0:
                    self.send_response(429)
                else:
                    with lock:
                        bodies.append(raw)
                    self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()
            finally:
                with lock:
                    peak["in_flight"] -= 1
                    peak["last"] = time.monotonic()

        def log_message(self, *a):
            pass

    class Srv(HTTPServer):
        daemon_threads = True

    import socketserver

    class TSrv(socketserver.ThreadingMixIn, HTTPServer):
        daemon_threads = True

    srv = TSrv(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}", state, bodies, peak
    srv.shutdown()


def test_http_sink_adaptive_end_to_end(spark, slow_server):
    """http_sink with concurrency='adaptive' delivers every event
    through concurrent requests, including past injected 429s."""
    from vector_spark.sinks import http_sink

    base, state, bodies, peak = slow_server
    state["delay"] = 0.02
    state["fail_every"] = 5  # every 5th request answers 429
    df = spark.createDataFrame(
        [(f"m{i}",) for i in range(120)], "message string"
    ).coalesce(2)
    n = http_sink(df, base + "/ingest", encoding="text",
                  batch_max_events=5, concurrency="adaptive")
    assert n == 120
    lines = []
    for b in bodies:
        lines += [x for x in b.decode().split("\n") if x]
    assert sorted(lines) == sorted(f"m{i}" for i in range(120))


def test_http_sink_fixed_concurrency_parallelism(spark, slow_server):
    """Fixed concurrency=6 actually overlaps requests: with a 150 ms
    server delay and 12 batches, wall clock is far below serial."""
    from vector_spark.sinks import http_sink

    base, state, bodies, peak = slow_server
    state["delay"] = 0.15
    df = spark.createDataFrame(
        [(f"x{i}",) for i in range(12)], "message string"
    ).coalesce(1)
    n = http_sink(df, base + "/ingest", encoding="text",
                  batch_max_events=1, concurrency=6)
    assert n == 12
    assert peak["max"] >= 3  # requests genuinely overlapped
    # the SERVER-side send window (first request in → last request
    # out) beats serial 12×150 ms — Spark job overhead excluded
    assert peak["last"] - peak["first"] < 12 * 0.15


def test_loader_request_concurrency_yaml(spark, slow_server):
    """The reference's `request: {concurrency: adaptive}` block on an
    http sink config routes through the ARC transport."""
    from vector_spark.config.loader import load_topology, run_sinks

    base, state, bodies, peak = slow_server
    state["delay"] = 0.03
    topo = load_topology(
        spark,
        f"""
sources:
  src:
    type: values
    rows:
      - {{message: "a"}}
      - {{message: "b"}}
      - {{message: "c"}}
sinks:
  out:
    type: http
    inputs: [src]
    url: {base}/ingest
    encoding: text
    batch_max_events: 1
    request:
      concurrency: adaptive
""",
    )
    res = run_sinks(topo)
    assert res["out"]["sent"] == 3
    got = sorted(x for b in bodies for x in b.decode().split("\n") if x)
    assert got == ["a", "b", "c"]
