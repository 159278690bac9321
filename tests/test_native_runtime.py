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


def test_shm_channel_same_process():
    name = "/qppvm_test_shm_a"
    pub = native.NativeSharedObject(name, size=6, create=True)
    sub = native.NativeSharedObject(name)
    seq, _ = sub.read()
    assert seq == 0  # never written
    pub.write([1, 2, 3, 4, 5, 6])
    seq, v = sub.read()
    assert seq == 2  # one completed write
    np.testing.assert_allclose(v, [1, 2, 3, 4, 5, 6])
    pub.write(np.arange(6) * 0.5)
    seq2, v2 = sub.read()
    assert seq2 == 4
    np.testing.assert_allclose(v2, np.arange(6) * 0.5)
    sub.close()
    pub.close()


def test_shm_channel_cross_process():
    """True cross-process publish/subscribe — the reference's
    Gazebo->plugin shared-memory pattern (/root/reference/src/ForceAcc.cpp:52-55)."""
    import subprocess
    import sys

    name = "/qppvm_test_shm_b"
    pub = native.NativeSharedObject(name, size=3, create=True)
    pub.write([7.0, 8.0, 9.0])
    code = (
        "from qppvm_tpu.runtime.native import NativeSharedObject;"
        f"ch = NativeSharedObject({name!r});"
        "seq, v = ch.read();"
        "assert seq == 2, seq;"
        "assert list(v) == [7.0, 8.0, 9.0], v;"
        "ch.write([1.0, 2.0, 3.0]);"
        "ch.close();"
        "print('child-ok')"
    )
    import os
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", ""))
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert "child-ok" in out.stdout, (out.stdout, out.stderr)
    seq, v = pub.read()  # child's write visible to the parent
    assert seq == 4
    np.testing.assert_allclose(v, [1.0, 2.0, 3.0])
    pub.close()
