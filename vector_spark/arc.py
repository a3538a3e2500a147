"""Adaptive Request Concurrency (ARC) — the reference's default
`request.concurrency: adaptive` congestion controller, re-expressed
for per-partition sink senders.

Algorithm pinned to `src/sinks/util/adaptive_concurrency/`
(controller.rs, mod.rs) and `lib/vector-common/src/stats/mod.rs`:

- a concurrency LIMIT starts at ``initial_concurrency`` (1) and is
  enforced by a shrinkable semaphore; requests acquire before sending;
- every response records an RTT sample into the current interval's
  arithmetic mean; only SUCCESSFUL responses count toward RTT
  (controller.rs: ``use_rtt = matches!(.., Successful)``);
- retryable statuses / timeouts / connection errors mark the interval
  as back-pressured (controller.rs adjust_to_response);
- once per averaged-RTT period (next_update), the limit adjusts
  AIMD-style (controller.rs manage_limit):
  - +1 (additive) when the limit was reached, no back pressure, and
    current mean RTT <= the EWMA past mean;
  - ×decrease_ratio (multiplicative, floor, min 1) on back pressure
    or when current RTT >= past mean + rtt_deviation_scale·stddev;
- the past-RTT EWMA-with-variance uses the reference's exact update
  (stats/mod.rs EwmaVar: ``variance = (1-α)(variance + diff·incr)``).

Defaults mirror mod.rs: initial 1, decrease_ratio 0.9, ewma_alpha 0.4,
rtt_deviation_scale 2.5, max_concurrency_limit 200. A fixed
``concurrency`` bypasses adaptation entirely (the reference's
``concurrency: <int>``).

Scale shape: one controller per executor PARTITION (matching the
reference's one-per-sink-endpoint), so a 1000-partition job probes the
downstream service from 1000 independent AIMD loops — the same
emergent fairness the reference gets from per-sink controllers across
a fleet.
"""

from __future__ import annotations

import threading
import time


class _EwmaVar:
    """EWMA mean+variance (lib/vector-common/src/stats/mod.rs)."""

    def __init__(self, alpha: float) -> None:
        self.alpha = alpha
        self.state: tuple[float, float] | None = None  # (mean, variance)

    def update(self, point: float) -> tuple[float, float]:
        if self.state is None:
            self.state = (point, 0.0)
        else:
            mean, variance = self.state
            diff = point - mean
            incr = self.alpha * diff
            self.state = (mean + incr,
                          (1.0 - self.alpha) * (diff * incr + variance))
        return self.state


class AdaptiveController:
    """Thread-safe ARC limiter for one sender (one partition)."""

    def __init__(
        self,
        concurrency: int | None = None,
        initial_concurrency: int = 1,
        decrease_ratio: float = 0.9,
        ewma_alpha: float = 0.4,
        rtt_deviation_scale: float = 2.5,
        max_concurrency_limit: int = 200,
    ) -> None:
        self._fixed = concurrency
        self.current_limit = (concurrency if concurrency
                              else initial_concurrency)
        self.decrease_ratio = decrease_ratio
        self.rtt_deviation_scale = rtt_deviation_scale
        self.max_concurrency_limit = max_concurrency_limit
        self._cond = threading.Condition()
        self.in_flight = 0
        self._past_rtt = _EwmaVar(ewma_alpha)
        self._next_update = 0.0
        self._rtt_sum = 0.0
        self._rtt_n = 0
        self._had_back_pressure = False
        self._reached_limit = False

    # ------------------------------------------------------------ gate

    def acquire(self) -> float:
        """Block until an in-flight slot frees under the current limit;
        returns the request start time (monotonic)."""
        with self._cond:
            while self.in_flight >= self.current_limit:
                self._cond.wait()
            self.in_flight += 1
            if self.in_flight >= self.current_limit:
                self._reached_limit = True
        return time.monotonic()

    # -------------------------------------------------------- feedback

    def adjust(self, start: float, *, backpressure: bool,
               use_rtt: bool) -> None:
        """Record one finished request (controller.rs
        adjust_to_response_inner)."""
        now = time.monotonic()
        rtt = max(now - start, 0.0)
        with self._cond:
            self.in_flight -= 1
            if backpressure:
                self._had_back_pressure = True
            if use_rtt:
                self._rtt_sum += rtt
                self._rtt_n += 1
            current_rtt = (self._rtt_sum / self._rtt_n
                           if self._rtt_n else None)
            if self._past_rtt.state is None:
                if current_rtt is not None:
                    self._past_rtt.update(current_rtt)
                    self._next_update = now + current_rtt
            elif now >= self._next_update:
                if self._fixed is None:
                    self._manage_limit(current_rtt)
                if current_rtt is not None:
                    self._past_rtt.update(current_rtt)
                self._next_update = now + self._past_rtt.state[0]
                self._rtt_sum = 0.0
                self._rtt_n = 0
                self._had_back_pressure = False
                self._reached_limit = False
            self._cond.notify_all()

    def _manage_limit(self, current_rtt: float | None) -> None:
        past_mean, past_var = self._past_rtt.state
        threshold = (past_var ** 0.5) * self.rtt_deviation_scale
        if (self.current_limit < self.max_concurrency_limit
                and self._reached_limit
                and not self._had_back_pressure
                and current_rtt is not None
                and current_rtt <= past_mean):
            self.current_limit += 1
        elif self.current_limit > 1 and (
                self._had_back_pressure
                or (current_rtt or 0.0) >= past_mean + threshold):
            self.current_limit = max(
                1, int(self.current_limit * self.decrease_ratio))


def send_all_adaptive(
    bodies,
    send_one,
    controller: AdaptiveController,
    is_backpressure_error,
) -> int:
    """Send every body from the ``bodies`` iterable through
    ``send_one(body)`` with ARC gating on a per-partition thread pool.

    ``send_one`` should perform ONE attempt (no internal retry-sleep —
    ARC owns pacing); raise to signal failure. ``is_backpressure_error``
    classifies an exception as back pressure (retryable status /
    timeout / connection error) vs a permanent protocol error
    (controller.rs: HTTP protocol errors are NOT back pressure).
    Back-pressure failures retry up to 3 more times, re-acquiring a
    slot each attempt; permanent errors raise immediately and fail the
    partition (Spark's task retry is the outer loop, as the driver's
    checkpoint is the delivery unit).

    Returns the number of bodies sent. Worker threads are bounded by
    ``max_concurrency_limit`` but only ``current_limit`` are ever
    admitted concurrently.
    """
    from concurrent.futures import ThreadPoolExecutor

    first_error: list[BaseException] = []
    lock = threading.Lock()

    def run(body) -> None:
        attempts = 0
        while True:
            start = controller.acquire()
            try:
                send_one(body)
            except Exception as err:  # noqa: BLE001 — classified below
                bp = bool(is_backpressure_error(err))
                controller.adjust(start, backpressure=bp,
                                  use_rtt=False)
                attempts += 1
                if bp and attempts <= 3:
                    time.sleep(0.2 * (2 ** (attempts - 1)))
                    continue
                with lock:
                    if not first_error:
                        first_error.append(err)
                return
            controller.adjust(start, backpressure=False, use_rtt=True)
            return

    sent = 0
    workers = min(controller.max_concurrency_limit, 32)
    # submission is BOUNDED: at most 2×workers bodies exist at once
    # (queued + in flight), so a partition-sized stream of large batch
    # bodies never materializes in memory — the serial path's
    # one-batch-alive property, relaxed only by the pipeline depth
    gate = threading.Semaphore(workers * 2)

    def gated(body) -> None:
        try:
            run(body)
        finally:
            gate.release()

    with ThreadPoolExecutor(max_workers=workers) as pool:
        futures = []
        for body in bodies:
            if first_error:
                break
            gate.acquire()
            futures.append(pool.submit(gated, body))
            sent += 1
        for f in futures:
            f.result()
    if first_error:
        raise first_error[0]
    return sent
