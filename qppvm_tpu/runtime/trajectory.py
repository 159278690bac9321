"""Reference-trajectory generators (trajectory_utils parity, SURVEY.md C23).

The reference links trajectory_utils (/root/reference/CMakeLists.txt:17,58)
but generates its Cartesian reference inline as a sinusoid
(/root/reference/src/QPPVMPlugin.cpp:217-223). Provided here: that exact
sinusoid, min-jerk point-to-point interpolation, and a generic waypoint
spline — all pure jnp, usable inside jitted steps.
"""
from __future__ import annotations

import jax.numpy as jnp


def qppvm_sinusoid(start_p, t, t0=0.0, amplitude: float = 0.15):
    """The reference's moving left-EE reference
    (/root/reference/src/QPPVMPlugin.cpp:217-223):
    y += A sin(t-t0), z += A (1 - cos(t-t0))."""
    dy = amplitude * jnp.sin(t - t0)
    dz = amplitude * (1.0 - jnp.cos(t - t0))
    zero = jnp.zeros_like(dy)
    return start_p + jnp.stack([zero, dy, dz])


def min_jerk(p0, p1, t, duration):
    """Min-jerk interpolation p0 -> p1 over [0, duration]; returns
    (position, velocity). Clamps outside the interval."""
    s = jnp.clip(t / duration, 0.0, 1.0)
    blend = 10.0 * s**3 - 15.0 * s**4 + 6.0 * s**5
    dblend = (30.0 * s**2 - 60.0 * s**3 + 30.0 * s**4) / duration
    p = p0 + (p1 - p0) * blend
    v = (p1 - p0) * dblend
    return p, v


def min_jerk_pva(p0, p1, t, duration):
    """Min-jerk with acceleration feedforward: returns (p, v, a). The accel
    channel feeds acceleration-level tasks' ``refs[...]["a"]`` so fast
    segments (e.g. a 300 ms swing-foot lift) track without huge servo
    gains."""
    s = jnp.clip(t / duration, 0.0, 1.0)
    blend = 10.0 * s**3 - 15.0 * s**4 + 6.0 * s**5
    dblend = (30.0 * s**2 - 60.0 * s**3 + 30.0 * s**4) / duration
    ddblend = (60.0 * s - 180.0 * s**2 + 120.0 * s**3) / duration**2
    d = p1 - p0
    return p0 + d * blend, d * dblend, d * ddblend


def waypoint_spline(waypoints, times, t):
    """Piecewise min-jerk through waypoints (K, d) at knot ``times`` (K,)."""
    waypoints = jnp.asarray(waypoints)
    times = jnp.asarray(times)
    K = waypoints.shape[0]
    idx = jnp.clip(jnp.searchsorted(times, t, side="right") - 1, 0, K - 2)
    t0 = times[idx]
    t1 = times[idx + 1]
    p, v = min_jerk(waypoints[idx], waypoints[idx + 1], t - t0,
                    jnp.maximum(t1 - t0, 1e-9))
    return p, v
