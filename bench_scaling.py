"""Multi-device scaling benchmark (BASELINE: >= 80% linear scaling).

Shards the batched humanoid WBC step over a ``rollout`` mesh of 1..N devices
and reports throughput + parallel efficiency. On the single-TPU bench host
this runs on N virtual CPU devices (the driver's multi-chip dryrun covers
compile+execute of the same shardings); on a real slice the identical code
rides ICI.

Prints one JSON line per mesh size, then a summary line.
Usage: python bench_scaling.py [--devices 8] [--batch 256] [--cpu]
"""
import argparse
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu or len(jax.devices()) < 2:
        # virtual multi-device CPU mesh (the standard fake-multi-chip trick)
        import os
        if "xla_force_host_platform_device_count" not in os.environ.get(
                "XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                       f" --xla_force_host_platform_device_count={args.devices}")
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from qppvm_tpu.model import zoo
    from qppvm_tpu.plugins.force_acc import ForceAccPlugin

    model = zoo.humanoid()
    plugin = ForceAccPlugin(model, contact_links=("l_sole", "r_sole"),
                            waist_link="pelvis", iters=30)
    state = model.home_state()
    refs, warm, _ = plugin.on_start(state)

    B = args.batch
    key = jax.random.PRNGKey(0)
    dq = 0.01 * jax.random.normal(key, (B, model.nj), jnp.float32)
    batch = lambda t: jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape).copy(), t)
    states = dataclasses.replace(batch(state), q=batch(state).q + dq)
    refs_b = batch(refs)
    warm_b = batch(warm)

    step = jax.vmap(lambda s, r, w: plugin._step_impl(s, r, w)[0])

    results = []
    sizes = [n for n in [1, 2, 4, 8, len(jax.devices())]
             if n <= len(jax.devices())]
    sizes = sorted(set(sizes))
    for nd in sizes:
        mesh = Mesh(np.asarray(jax.devices()[:nd]), ("rollout",))
        spec = NamedSharding(mesh, P("rollout"))
        shard = lambda t: jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(
                mesh, P("rollout", *([None] * (a.ndim - 1))))), t)
        s_sh, r_sh, w_sh = shard(states), shard(refs_b), shard(warm_b)
        fn = jax.jit(step)
        out = fn(s_sh, r_sh, w_sh)
        out.block_until_ready()
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(s_sh, r_sh, w_sh)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        results.append((nd, B / dt))
        print(json.dumps({"devices": nd, "solves_per_s": round(B / dt, 1)}))

    base = results[0][1]
    eff = [(nd, r / (base * nd)) for nd, r in results]
    last_nd, last_eff = eff[-1]
    virtual = jax.devices()[0].platform == "cpu"
    out = {
        "metric": "multi_device_scaling_efficiency",
        "value": round(last_eff, 3),
        "unit": f"fraction_linear@{last_nd}dev",
        "vs_baseline": round(last_eff / 0.8, 3),
        "per_device": {str(nd): round(e, 3) for nd, e in eff},
    }
    if virtual:
        # On virtual CPU devices all "devices" share one host's cores, and
        # the 1-device baseline already uses them all via XLA intra-op
        # threading — fraction_linear is NOT a statement about ICI scaling.
        # What this run does validate: the sharded program compiles, runs,
        # and total throughput still rises with mesh size (no collective
        # bottleneck in the program structure).
        out["note"] = ("virtual CPU mesh: shared-core efficiency, not ICI "
                       "scaling; speedup@%d=%.2fx validates sharding "
                       "structure only" % (last_nd,
                                           results[-1][1] / base))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
