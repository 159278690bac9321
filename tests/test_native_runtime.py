"""Native C++ RT runtime tests (executor pacing + SPSC trace ring)."""
import numpy as np
import pytest

from qppvm_tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_executor_paces_and_counts():
    ex = native.NativeExecutor(period_s=1e-3)
    ticks = []

    def cb(tick, t_s):
        ticks.append((tick, t_s))
        return True

    n = ex.run(cb, 50)
    assert n == 50
    assert len(ticks) == 50
    stats = ex.stats()
    assert stats["p99_s"] < 1e-3  # trivial callback fits the budget
    # pacing: total elapsed ~ 50 ms -> timestamps spread out
    assert ticks[-1][1] >= 0.04


def test_executor_early_stop():
    ex = native.NativeExecutor(period_s=1e-4)
    n = ex.run(lambda tick, t: tick < 10, 1000)
    assert n == 11


def test_ring_roundtrip():
    ring = native.NativeTraceRing(1 << 16)
    for i in range(10):
        assert ring.push(7, np.full(4, float(i)))
    out = []
    while True:
        rec = ring.pop()
        if rec is None:
            break
        out.append(rec)
    assert len(out) == 10
    ch, data = out[3]
    assert ch == 7
    np.testing.assert_allclose(data, 3.0)
    assert ring.dropped == 0


def test_ring_overflow_drops_not_corrupts():
    ring = native.NativeTraceRing(256)
    for i in range(100):
        ring.push(1, np.full(8, float(i)))
    assert ring.dropped > 0
    seen = 0
    while (rec := ring.pop()) is not None:
        ch, data = rec
        assert ch == 1
        assert np.all(data == data[0])  # intact record
        seen += 1
    assert seen >= 1
