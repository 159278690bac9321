"""Throughput vs batch size for the full WBC step (tuning aid for bench.py).

Prints one JSON line per batch size. The headline bench uses the knee of
this curve.
"""
import dataclasses
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batches", default="256,512,1024,2048,4096")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from qppvm_tpu.model import zoo
    from qppvm_tpu.plugins.force_acc import ForceAccPlugin

    from qppvm_tpu.mpc.rollout import standing_state

    model = zoo.humanoid()
    contacts = ("l_sole", "r_sole")
    # same fast RT profile as bench.py (closed-loop validated for this
    # flat-contact stack; equality-elimination era — see opt/qp.py n_eq_*)
    plugin = ForceAccPlugin(model, contact_links=contacts,
                            waist_link="pelvis", iters=12,
                            solver_opts=dict(rho_updates=0,
                                             warm_kinv_iters=4))
    state = standing_state(model, contacts)
    refs, warm, _ = plugin.on_start(state)

    # All timing BEFORE any device->host readback (the axon tunnel's
    # readback penalty poisons every later dispatch — see bench.py).
    results = []
    step = jax.jit(jax.vmap(plugin._step_impl))
    for batch in [int(b) for b in args.batches.split(",")]:
        states = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (batch,) + a.shape), state)
        refs_b = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (batch,) + a.shape), refs)
        warm_b = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (batch,) + a.shape), warm)
        dq = 0.01 * jax.random.normal(jax.random.PRNGKey(0),
                                      (batch, model.nj), jnp.float32)
        states = dataclasses.replace(states, q=states.q + dq)
        tau, _, aux = step(states, refs_b, warm_b)
        tau.block_until_ready()
        fail_dev = jnp.mean(aux.solver_failed.astype(jnp.float32))
        n_rep = 50
        t0 = time.perf_counter()
        for _ in range(n_rep):
            tau, _, _ = step(states, refs_b, warm_b)
        tau.block_until_ready()
        dt = (time.perf_counter() - t0) / n_rep
        results.append((batch, dt, fail_dev))
    for batch, dt, fail_dev in results:  # readbacks after ALL timing
        fail = float(fail_dev)
        if fail > 0.0:
            raise RuntimeError(f"fail_frac={fail} at batch {batch}")
        print(json.dumps({"batch": batch,
                          "solves_per_s": round(batch / dt, 1),
                          "ms_per_batch": round(dt * 1e3, 2),
                          "solver_fail_frac": fail}), flush=True)


if __name__ == "__main__":
    main()
