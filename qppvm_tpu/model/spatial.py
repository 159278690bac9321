"""Spatial (Plücker) algebra primitives for rigid-body dynamics.

Featherstone conventions, angular-first:

- spatial motion vector  v = [omega; v_lin]   (6,)
- spatial force  vector  f = [n_torque; f_lin] (6,)
- a coordinate frame is (E, p): ``E`` rotates parent coords into local coords
  (rows of E are the local axes expressed in parent coords) and ``p`` is the
  frame origin expressed in parent coords.

All functions are pure jnp and batch transparently under ``vmap`` (no batch
dims are assumed explicitly).

The *public* task-level convention of the framework (Jacobians, twists,
wrenches) is linear-first ``[v; omega]`` / ``[f; n]`` to match the reference's
KDL/OpenSoT ordering (e.g. wrench bounds ``[1000,1000,1000,1,1,1]`` at
/root/reference/src/ForceAcc.cpp:74-76 are force-then-torque). Conversion
happens at the kinematics API boundary, not here.
"""
from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    """3-vector -> 3x3 skew-symmetric matrix (vx @ u == cross(v, u))."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def rot_x(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z], axis=-1),
            jnp.stack([z, c, s], axis=-1),
            jnp.stack([z, -s, c], axis=-1),
        ],
        axis=-2,
    )


def rot_y(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, -s], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([s, z, c], axis=-1),
        ],
        axis=-2,
    )


def rot_z(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, s, z], axis=-1),
            jnp.stack([-s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def rot_axis_angle(axis, theta):
    """Rodrigues. Returns E = R(axis, theta)^T, i.e. the *coordinate* rotation
    that maps parent coords to child coords for a revolute joint rotating the
    child frame by +theta about ``axis`` (unit, in parent coords)."""
    axis = axis / jnp.linalg.norm(axis)
    c, s = jnp.cos(theta), jnp.sin(theta)
    K = skew(axis)
    R = jnp.eye(3, dtype=theta.dtype if hasattr(theta, "dtype") else None)
    R = R + s * K + (1.0 - c) * (K @ K)  # rotates vectors by +theta about axis
    return R.T  # coordinate transform (child-from-parent)


def xform(E, p):
    """Spatial motion transform X such that v_child = X @ v_parent.

    Child frame at origin p (parent coords), orientation E (child-from-parent
    coordinate rotation).  X = [[E, 0], [-E p^x, E]].
    """
    Z = jnp.zeros_like(E)
    top = jnp.concatenate([E, Z], axis=-1)
    bot = jnp.concatenate([-E @ skew(p), E], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def xform_inv_apply(E, p, v):
    """Apply X^{-1} (child->parent motion transform) to motion vector v."""
    w = jnp.einsum("...ji,...j->...i", E, v[..., :3])
    lin = jnp.einsum("...ji,...j->...i", E, v[..., 3:]) + jnp.cross(p, w)
    return jnp.concatenate([w, lin], axis=-1)


def xform_apply(E, p, v):
    """Apply X (parent->child motion transform) to motion vector v."""
    w = jnp.einsum("...ij,...j->...i", E, v[..., :3])
    lin = jnp.einsum("...ij,...j->...i", E, v[..., 3:] - jnp.cross(p, v[..., :3]))
    return jnp.concatenate([w, lin], axis=-1)


def xform_force_apply(E, p, f):
    """Apply force transform X* = X^{-T} (parent->child): f_child = X* f_parent."""
    n = jnp.einsum("...ij,...j->...i", E, f[..., :3] - jnp.cross(p, f[..., 3:]))
    lin = jnp.einsum("...ij,...j->...i", E, f[..., 3:])
    return jnp.concatenate([n, lin], axis=-1)


def xform_force_inv_apply(E, p, f):
    """Apply (X*)^{-1} = X^T (child->parent force transform)."""
    lin = jnp.einsum("...ji,...j->...i", E, f[..., 3:])
    n = jnp.einsum("...ji,...j->...i", E, f[..., :3]) + jnp.cross(p, lin)
    return jnp.concatenate([n, lin], axis=-1)


def crm(v):
    """Spatial cross product operator for motion vectors: crm(v) @ m = v x m."""
    w, lin = v[..., :3], v[..., 3:]
    Z = jnp.zeros_like(skew(w))
    top = jnp.concatenate([skew(w), Z], axis=-1)
    bot = jnp.concatenate([skew(lin), skew(w)], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def cross_motion(v, m):
    """v x m for motion vectors (avoids building the 6x6)."""
    w, lin = v[..., :3], v[..., 3:]
    mw, mlin = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(lin, mw) + jnp.cross(w, mlin)], axis=-1
    )


def cross_force(v, f):
    """v x* f for a motion vector v and force vector f."""
    w, lin = v[..., :3], v[..., 3:]
    fn, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, fn) + jnp.cross(lin, fl), jnp.cross(w, fl)], axis=-1
    )


def mcI(m, c, Ic):
    """Spatial inertia (6x6) of a body: mass m, CoM c (local coords), rotational
    inertia Ic about the CoM (local coords)."""
    C = skew(c)
    I3 = jnp.eye(3, dtype=Ic.dtype)
    top = jnp.concatenate([Ic + m * (C @ C.T), m * C], axis=-1)
    bot = jnp.concatenate([m * C.T, m * I3], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def inertia_apply(I, v):
    """I @ v for 6x6 spatial inertia."""
    return jnp.einsum("...ij,...j->...i", I, v)


def quat_to_mat(qw, qx, qy, qz):
    """Unit quaternion (w,x,y,z) -> rotation matrix R (rotates vectors)."""
    return jnp.stack(
        [
            jnp.stack(
                [
                    1 - 2 * (qy * qy + qz * qz),
                    2 * (qx * qy - qw * qz),
                    2 * (qx * qz + qw * qy),
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    2 * (qx * qy + qw * qz),
                    1 - 2 * (qx * qx + qz * qz),
                    2 * (qy * qz - qw * qx),
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    2 * (qx * qz - qw * qy),
                    2 * (qy * qz + qw * qx),
                    1 - 2 * (qx * qx + qy * qy),
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def so3_log(R):
    """Rotation matrix -> rotation vector (axis * angle). Safe near 0."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # w = 2 sin(theta) * axis ; scale = theta / (2 sin theta), -> 1/2 near 0
    s = jnp.sin(theta)
    small = jnp.abs(s) < 1e-6
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / jnp.where(small, 1.0, 2.0 * s))
    return w * scale[..., None]


def so3_exp(w):
    """Rotation vector -> rotation matrix, safe near 0."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    small = theta[..., 0] < 1e-8
    axis = w / jnp.where(theta > 1e-8, theta, 1.0)
    K = skew(axis)
    t = theta[..., None]
    R = jnp.eye(3, dtype=w.dtype) + jnp.sin(t) * K + (1.0 - jnp.cos(t)) * (K @ K)
    return jnp.where(small[..., None, None], jnp.eye(3, dtype=w.dtype) + skew(w), R)


def pose_error(R_ref, p_ref, R, p):
    """6D pose error [e_pos; e_rot] (linear-first, world frame).

    e_pos = p_ref - p ;  e_rot = log(R_ref R^T) (world-frame rotation vector).
    This is the classical impedance-control pose error used by the torque
    CartesianImpedanceCtrl task (reference /root/reference/src/QPPVMPlugin.cpp:136-140:
    a 6x6 stiffness acts on this error).
    """
    e_pos = p_ref - p
    e_rot = so3_log(R_ref @ jnp.swapaxes(R, -1, -2))
    return jnp.concatenate([e_pos, e_rot], axis=-1)
