"""Centroidal (single-rigid-body) dynamics for gradient-based MPC.

The sampling MPC (mpc/sampling.py) rolls out the full WBC-in-the-loop
dynamics; the DDP/iLQR planner works on the standard reduced model used for
legged MPC: a single rigid body driven by contact forces at known foothold
positions. State x = [p(3) com position; v(3) com velocity; th(3)
small-angle orientation; w(3) angular velocity], control u = stacked
per-contact forces (nc*3, world frame).

    m v̇ = Σ f_c + m g
    I ẇ = Σ (r_c − p) × f_c
    ṗ  = v,   θ̇ = w

Pure function of (x, u, params); jit/vmap/grad-safe (the iLQR backward pass
differentiates it with jax.jacfwd). Greenfield vs the reference (SURVEY.md
§2c): the reference plans nothing — this is the north star's "DDP-style MPC"
layer, feeding the WBC (plugins/force_acc.py) as the tracking controller.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CentroidalParams:
    mass: jax.Array          # ()
    inertia: jax.Array       # (3, 3) body inertia about the CoM
    footholds: jax.Array     # (nc, 3) world foothold positions
    active: jax.Array        # (nc,) 0/1 contact gates
    gravity: jax.Array       # (3,)
    dt: jax.Array            # ()

    @property
    def nc(self) -> int:
        return self.footholds.shape[0]


NX = 12


def nu(params: CentroidalParams) -> int:
    return 3 * params.nc


def from_robot(model, data, contact_links, dt: float,
               active=None) -> CentroidalParams:
    """Extract SRBD parameters from the full model at the current state.
    ``data``: dynamics.ModelData. Inertia: the 3x3 rotational block of the
    CoM-centered composite inertia approximated by the base link's world
    inertia plus point masses (adequate for stance-phase MPC)."""
    from qppvm_tpu.model import dynamics as dyn
    feet = jnp.stack([dyn.frame_data(model, data, c)[1]
                      for c in contact_links])
    nc = len(contact_links)
    m = data.total_mass
    # composite rotational inertia about the CoM from the generalized mass
    # matrix's angular block (world frame, base at index 0:3 angular)
    I3 = data.B[:3, :3]
    return CentroidalParams(
        mass=m, inertia=I3, footholds=feet,
        active=(jnp.ones(nc, feet.dtype) if active is None
                else jnp.asarray(active, feet.dtype)),
        gravity=jnp.asarray(model.gravity, feet.dtype),
        dt=jnp.asarray(dt, feet.dtype))


def init_state(com_pos, com_vel=None, dtype=jnp.float32) -> jax.Array:
    x = jnp.zeros(NX, dtype)
    x = x.at[0:3].set(jnp.asarray(com_pos, dtype))
    if com_vel is not None:
        x = x.at[3:6].set(jnp.asarray(com_vel, dtype))
    return x


def dynamics_step(params: CentroidalParams, x: jax.Array,
                  u: jax.Array) -> jax.Array:
    """One semi-implicit Euler step of the SRBD model."""
    p, v, th, w = x[0:3], x[3:6], x[6:9], x[9:12]
    f = u.reshape(params.nc, 3) * params.active[:, None]
    F = jnp.sum(f, axis=0) + params.mass * params.gravity
    tau = jnp.sum(jnp.cross(params.footholds - p[None, :], f), axis=0)
    # small-angle: world inertia ~ body inertia (stance-phase MPC)
    from qppvm_tpu.opt import linalg as _linalg
    Iinv = _linalg.spd_inverse_ns(params.inertia, iters=14, refine=2)
    v_n = v + params.dt * F / params.mass
    w_n = w + params.dt * (Iinv @ tau)
    p_n = p + params.dt * v_n
    th_n = th + params.dt * w_n
    return jnp.concatenate([p_n, v_n, th_n, w_n])


def standing_cost(params: CentroidalParams, p_ref,
                  w_pos=50.0, w_vel=1.0, w_ang=20.0, w_rate=0.5,
                  w_force=1e-5, w_slack=1e-3):
    """Quadratic tracking cost factory: (x, u) -> scalar. ``w_slack``
    penalizes tangential force (soft friction-cone surrogate; the WBC
    tracking layer enforces the true cones)."""
    p_ref = jnp.asarray(p_ref)

    def cost(x, u):
        p, v, th, w = x[0:3], x[3:6], x[6:9], x[9:12]
        f = u.reshape(params.nc, 3)
        c = (w_pos * jnp.sum((p - p_ref) ** 2)
             + w_vel * jnp.sum(v ** 2)
             + w_ang * (jnp.sum(th ** 2) + 0.1 * jnp.sum(w ** 2))
             + w_rate * 0.0
             + w_force * jnp.sum(u ** 2)
             + w_slack * jnp.sum(f[:, :2] ** 2))
        return c

    return cost


def gravity_feedforward(params: CentroidalParams) -> jax.Array:
    """Static force distribution: weight split over active contacts —
    the natural U₀ for iLQR warm start."""
    dtype = params.footholds.dtype
    active = params.active.astype(dtype)
    n_act = jnp.maximum(jnp.sum(active), 1.0)
    fz = -params.mass.astype(dtype) * params.gravity[2].astype(dtype) / n_act
    f = jnp.zeros((params.nc, 3), dtype)
    f = f.at[:, 2].set(fz * active)
    return f.reshape(-1)
