"""Benchmark: whole-body QP solves/s/chip + p99 step latency vs the 1 ms
real-time budget (BASELINE.md north star: >= 10k solves/s/chip at 30+ DoF).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Health-gated: refuses to print a number unless every solve in the measured
batch passed its QP health check (solver_fail_frac == 0) — the batch analog
of the reference's per-tick solve-failure signal
(/root/reference/src/QPPVMPlugin.cpp:246-249).

p99 is a REAL percentile over >=1000 individually timed single-step
dispatches (warm-start state carried across calls like the 1 kHz loop
would); dispatch overhead is included, so the number is a conservative
upper bound on device step latency (measured dispatch floor ~0.06 ms).

Runs on whatever jax.devices() provides (the driver runs it on one real TPU
chip; JAX_PLATFORMS=cpu works for local smoke tests).
"""
import dataclasses
import json
import time

import jax

# Persistent compilation cache: the large XLA programs here take minutes to
# build over the tunnel; cached, a bench run completes in seconds.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

TARGET_SOLVES_PER_S = 10_000.0  # BASELINE.json north-star target
BUDGET_MS = 1.0


def main():
    import argparse

    from qppvm_tpu.model import zoo
    from qppvm_tpu.mpc.rollout import standing_state
    from qppvm_tpu.plugins.force_acc import ForceAccPlugin

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    # "pallas" routes the vmapped throughput section through the fused
    # VMEM-resident whole-solve kernel (opt/pallas_qp.py); the unbatched
    # latency/rt-loop sections are unaffected (the kernel is batch-only by
    # design — custom_vmap routes only vmapped solves). Default since
    # round 5: measured 76.5k vs 57.2k solves/s on TPU v5e at batch 1024
    # with identical health gates (fail 0, prim 7.8e-5); `--backend xla`
    # keeps the round-4 path for A/B.
    ap.add_argument("--backend", default="pallas", choices=("xla", "pallas"))
    args = ap.parse_args()

    model = zoo.humanoid()  # 32 DoF + floating base
    contacts = ("l_sole", "r_sole")
    # fast RT profile, equality-elimination era: the projected ADMM matrix
    # (opt/qp.py n_eq_*) is ~5-conditioned, so 12 ADMM iterations + a
    # 4-iteration warm NS re-converge the KKT inverse every tick.
    # Closed-loop validated by tools/validate_rt_profile.py --profile eq_w4
    # --iters 12 (500-tick stand, 0 failures, base drift -3.9 mm,
    # max prim res 5.2e-7); the cones/6D stack also validates on this
    # rho_updates=0 profile post-elimination.
    # cold_ns_iters=10: the guard-rejected/first-tick COLD NS fallback gets
    # its own budget (a 4-iteration cold start leaves ~3% inverse error even
    # on the cond~5 projected matrix); lax.cond keeps the warm fast path at
    # 4 iterations in the unbatched RT loop (ADVICE r2 #4).
    plugin = ForceAccPlugin(model, contact_links=contacts,
                            waist_link="pelvis", iters=12,
                            solver_opts=dict(rho_updates=0,
                                             warm_kinv_iters=4,
                                             cold_ns_iters=10,
                                             scale_iters=2,
                                             pinv_ns_iters=5,
                                             backend=args.backend))
    state = standing_state(model, contacts)
    refs, warm, _ = plugin.on_start(state)

    # ---- throughput: batched full WBC steps (one QP cascade per item) ----
    BATCH = args.batch
    step = jax.jit(jax.vmap(plugin._step_impl))
    states = jax.tree.map(lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape),
                          state)
    refs_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape),
                          refs)
    warm_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape),
                          warm)
    # vary states slightly so nothing is constant-folded
    key = jax.random.PRNGKey(0)
    dq = 0.01 * jax.random.normal(key, (BATCH, model.nj), jnp.float32)
    states = dataclasses.replace(states, q=states.q + dq)

    # NOTE ON ORDERING: on the axon TPU tunnel, a single device->host
    # readback (float()/np.asarray/device_get) permanently degrades every
    # subsequent dispatch by ~23 ms (measured; never recovers within the
    # process). ALL timed sections therefore run BEFORE any readback —
    # block_until_ready is safe — and the health gate + JSON printing do
    # their readbacks at the very end. Round-1 numbers (and this round's
    # first measurement) gated on health first and timed everything in
    # degraded mode.
    tau, _, aux = step(states, refs_b, warm_b)
    tau.block_until_ready()  # compile + warm
    fail_frac_dev = jnp.mean(aux.solver_failed.astype(jnp.float32))
    prim_res_dev = jnp.max(aux.prim_res)
    tau_finite_dev = jnp.all(jnp.isfinite(tau))

    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        tau, _, _ = step(states, refs_b, warm_b)
    tau.block_until_ready()
    dt_total = (time.perf_counter() - t0) / n_rep
    solves_per_s = BATCH / dt_total

    # ---- MFU: matmul FLOPs of the batched program / wall time / peak ----
    # (VERDICT r3 missing #5 — how far from the hardware ceiling the solver
    # runs, not just solves/s. Analytical jaxpr count: XLA's cost_analysis
    # omits scan trip counts and would undercount ~50x.) FLOPs are linear
    # in batch, so trace a batch-8 probe and scale — tracing the full
    # batch-1024 program costs minutes of pure Python.
    from qppvm_tpu import bench_util
    PROBE = 8
    probe8 = lambda t: jax.tree.map(lambda a: a[:PROBE], t)  # noqa: E731
    flops = bench_util.jaxpr_matmul_flops(
        jax.vmap(plugin._step_impl), probe8(states), probe8(refs_b),
        probe8(warm_b)) * (BATCH / PROBE)
    device_kind = jax.devices()[0].device_kind
    mfu = bench_util.mfu(flops, dt_total, device_kind)

    # ---- latency: measured per-step distribution -------------------------
    # >=1000 individually timed dispatches of the single (non-batched) WBC
    # step, chaining the warm state across calls exactly like the 1 kHz
    # control loop. Each sample = one wall-clock dispatch incl. transport,
    # so percentiles are conservative upper bounds on the device step time.
    step1 = jax.jit(plugin._step_impl)
    tau1, warm1, aux1 = step1(state, refs, warm)
    tau1.block_until_ready()
    lat_fail_dev = aux1.solver_failed
    N_LAT = 1000
    lat_ms = np.empty(N_LAT)
    w = warm1
    for i in range(N_LAT):
        t0 = time.perf_counter()
        tau1, w, _ = step1(state, refs, w)
        tau1.block_until_ready()
        lat_ms[i] = (time.perf_counter() - t0) * 1e3
    p50 = float(np.percentile(lat_ms, 50))
    p99 = float(np.percentile(lat_ms, 99))

    # ---- readbacks + health gate (AFTER all timing) ----------------------
    # Health gate: every batch item must have a CONVERGED solve. A solver
    # that NaNs or trips the zero-torque fallback would otherwise
    # "benchmark" garbage (the r1 facade — VERDICT.md round 1, weak #1/#2).
    fail_frac = float(fail_frac_dev)
    prim_res_max = float(prim_res_dev)
    if not bool(tau_finite_dev):
        raise RuntimeError("benchmark torque is non-finite; refusing")
    if fail_frac > 0.0:
        raise RuntimeError(
            f"solver_fail_frac={fail_frac:.4f} (prim_res_max="
            f"{prim_res_max:.4g}) — unhealthy solves; numbers would be bogus")
    if bool(lat_fail_dev):
        raise RuntimeError("latency-loop solve failed its health check")

    # ---- device-resident closed-loop budget verdict ----------------------
    # The authoritative 1 ms measurement (bench_rt_loop.py: 500 ticks of
    # WBC + contact physics in one state-fed-back lax.scan, health-gated on
    # zero failures AND the robot still standing) folded INTO this JSON
    # line so the driver artifact itself carries the budget verdict
    # (VERDICT r3 next #5). Run as a subprocess: a fresh process keeps its
    # dispatch path clean of this process's readback-degraded transport.
    import pathlib
    import subprocess
    import sys
    rt_script = str(pathlib.Path(__file__).resolve().parent
                    / "bench_rt_loop.py")
    rt = subprocess.run(
        [sys.executable, rt_script, "--ticks", "500"],
        capture_output=True, text=True, timeout=3000)
    if rt.returncode != 0:
        raise RuntimeError(
            f"rt-loop bench failed (health gate?):\n{rt.stdout}\n{rt.stderr}")
    rt_json = json.loads(rt.stdout.strip().splitlines()[-1])
    rt_fields = {"rt_loop_tick_ms": rt_json["value"],
                 "rt_control_tick_ms": rt_json["control_tick_ms"],
                 "within_budget": rt_json["within_budget"]}

    print(json.dumps({
        "metric": "wbc_qp_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / TARGET_SOLVES_PER_S, 3),
        "batch": BATCH,
        "dof": model.nv,
        "solver_fail_frac": fail_frac,
        "prim_res_max": float(f"{prim_res_max:.3g}"),
        "p50_step_ms": round(p50, 4),
        "p99_step_ms": round(p99, 4),
        "latency_samples": N_LAT,
        "p99_within_budget": p99 <= BUDGET_MS,
        "mfu": None if mfu is None else round(mfu, 4),
        "program_flops_per_batch_step": flops,
        **rt_fields,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
