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

    model = zoo.humanoid()
    plugin = ForceAccPlugin(model, contact_links=("l_sole", "r_sole"),
                            waist_link="pelvis", iters=30)
    state = model.home_state()
    refs, warm, _ = plugin.on_start(state)

    for batch in [int(b) for b in args.batches.split(",")]:
        step = jax.jit(jax.vmap(lambda s, r, w: plugin._step_impl(s, r, w)[0]))
        states = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (batch,) + a.shape), state)
        refs_b = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (batch,) + a.shape), refs)
        warm_b = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (batch,) + a.shape), warm)
        dq = 0.01 * jax.random.normal(jax.random.PRNGKey(0),
                                      (batch, model.nj), jnp.float32)
        states = dataclasses.replace(states, q=states.q + dq)
        tau = step(states, refs_b, warm_b)
        tau.block_until_ready()
        if not bool(jnp.all(jnp.isfinite(tau))):
            raise RuntimeError("non-finite torque at batch %d" % batch)
        n_rep = 10
        t0 = time.perf_counter()
        for _ in range(n_rep):
            tau = step(states, refs_b, warm_b)
        tau.block_until_ready()
        dt = (time.perf_counter() - t0) / n_rep
        print(json.dumps({"batch": batch,
                          "solves_per_s": round(batch / dt, 1),
                          "ms_per_batch": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
