"""Built-in robot models covering the BASELINE.json configs.

The reference loads Centauro variants from YAML/URDF configs
(/root/reference/src/QPPVMPlugin.cpp:50, /root/reference/src/ForceAcc.cpp:43).
This zoo provides topology-equivalent programmatic models with physically
plausible inertial parameters:

- ``arm7``        : fixed-base 7-DoF arm                      (config 1)
- ``dual_arm``    : fixed-base torso + two 7-DoF arms, link names
                    ``arm1_*`` / ``arm2_*`` as in the reference (config 2)
- ``quadruped``   : floating-base "pelvis" + 4 legs, feet named
                    ``foot_fl/fr/hr/hl`` (/root/reference/src/ForceAcc.cpp:58)
- ``biped``       : floating-base biped, feet ``l_sole``/``r_sole`` (config 3)
- ``humanoid``    : floating-base 32-DoF humanoid              (config 4/5)
"""
from __future__ import annotations

import numpy as np

from qppvm_tpu.model.robot import PRISMATIC, REVOLUTE, RobotModel, build_model


def _box_inertia(m, x, y, z):
    return np.diag([
        m / 12.0 * (y * y + z * z),
        m / 12.0 * (x * x + z * z),
        m / 12.0 * (x * x + y * y),
    ])


class _Builder:
    def __init__(self, root_name="base_link", floating=False, base_mass=0.0,
                 base_size=(0.3, 0.3, 0.2)):
        self.parent = []
        self.joint_type = []
        self.axis = []
        self.E = []
        self.p = []
        self.mass = []
        self.com = []
        self.icom = []
        self.jn = []
        self.ln = []
        self.q_home = []
        self.q_min = []
        self.q_max = []
        self.tau_max = []
        self.armature = []
        self.root_name = root_name
        self.floating = floating
        self.base_mass = base_mass
        self.base_inertia = _box_inertia(max(base_mass, 1e-6), *base_size)

    def add(self, name, parent, axis, offset, mass, length,
            link_name=None, jtype=REVOLUTE, home=0.0, lim=2.9, tau=150.0,
            radius=0.05, com_along=None):
        """Add link+joint. ``offset``: joint origin in parent coords.
        ``length``: used for a rod-like inertia along ``com_along`` (defaults
        to the offset direction of the *next* expected link: +z)."""
        i = len(self.parent)
        self.parent.append(parent)
        self.joint_type.append(jtype)
        self.axis.append(np.asarray(axis, float))
        self.E.append(np.eye(3))
        self.p.append(np.asarray(offset, float))
        self.mass.append(mass)
        d = np.asarray(com_along if com_along is not None else [0, 0, 1.0], float)
        d = d / max(np.linalg.norm(d), 1e-9)
        self.com.append(d * length / 2.0)
        # rod + cylinder inertia about com
        I_axial = 0.5 * mass * radius * radius
        I_perp = mass * (length * length / 12.0 + radius * radius / 4.0)
        Ic = np.eye(3) * I_perp
        Ic += np.outer(d, d) * (I_axial - I_perp)
        self.icom.append(Ic)
        self.jn.append(f"j_{name}" if not name.startswith("j_") else name)
        self.ln.append(link_name or name)
        self.q_home.append(home)
        self.q_min.append(-lim)
        self.q_max.append(lim)
        self.tau_max.append(tau)
        # reflected rotor/gearbox inertia: scales with actuator rating; keeps
        # distal joints well-conditioned like real harmonic-drive actuators
        self.armature.append(0.01 + 1e-3 * tau)
        return i

    def finish(self, gravity=(0, 0, -9.81)):
        return build_model(
            parent=self.parent,
            joint_type=self.joint_type,
            axis=np.stack(self.axis),
            E_tree=np.stack(self.E),
            p_tree=np.stack(self.p),
            mass=self.mass,
            com=self.com,
            inertia_com=self.icom,
            joint_names=self.jn,
            link_names=self.ln,
            root_name=self.root_name,
            floating=self.floating,
            base_mass=self.base_mass,
            base_inertia_com=self.base_inertia,
            q_home=self.q_home,
            q_min=self.q_min,
            q_max=self.q_max,
            tau_max=self.tau_max,
            armature=self.armature,
            gravity=gravity,
        )


def _add_arm7(b, prefix, parent, root_offset, mirror=1.0, home=None):
    """7-DoF anthropomorphic arm; links ``{prefix}_1..7``."""
    if home is None:
        home = [0.0, 0.5 * mirror, 0.0, -1.2, 0.0, 0.8, 0.0]
    axes = [(0, 0, 1), (0, 1, 0), (0, 0, 1), (0, 1, 0), (0, 0, 1), (0, 1, 0), (0, 0, 1)]
    lens = [0.15, 0.12, 0.26, 0.12, 0.24, 0.10, 0.08]
    mass = [3.0, 2.6, 2.4, 2.0, 1.6, 1.2, 0.6]
    taus = [120, 120, 80, 80, 40, 40, 20]
    off = [root_offset, (0, 0, 0.15), (0, 0, 0.12), (0, 0, 0.26),
           (0, 0, 0.12), (0, 0, 0.24), (0, 0, 0.10)]
    p = parent
    for k in range(7):
        p = b.add(f"{prefix}_{k + 1}", p, axes[k], off[k], mass[k], lens[k],
                  home=home[k], tau=taus[k])
    return p


def arm7() -> RobotModel:
    """Fixed-base 7-DoF arm (BASELINE config 1)."""
    b = _Builder(root_name="base_link")
    _add_arm7(b, "arm1", -1, (0, 0, 0.1))
    return b.finish()


def dual_arm() -> RobotModel:
    """Fixed-base torso + two 7-DoF arms (reference QPPVM robot shape:
    Centauro upper body, links arm1_7 / arm2_7 as end-effectors,
    /root/reference/src/QPPVMPlugin.cpp:129-152)."""
    b = _Builder(root_name="base_link")
    torso = b.add("torso_yaw", -1, (0, 0, 1), (0, 0, 0.4), 10.0, 0.3,
                  link_name="torso", tau=200.0)
    _add_arm7(b, "arm1", torso, (0.0, 0.25, 0.25), mirror=1.0)
    _add_arm7(b, "arm2", torso, (0.0, -0.25, 0.25), mirror=-1.0)
    return b.finish()


def _add_leg4(b, prefix, parent, root_offset, foot_name):
    """4-DoF (hip pitch/roll, knee, ankle pitch) leg ending in a foot link.

    The foot contact frame sits at the DISTAL end of the shank (the ankle
    joint origin), NOT at the knee: link frames live at their joint, so
    naming the shank body itself as the foot would put the contact point ON
    the knee axis — zeroing the knee column of the contact Jacobian and
    leaving the leg only ~0.14 m/rad of z authority through the hip
    (measured; the round-2 leg-lift failure). The ankle joint itself has no
    linear authority at the contact point (point foot) and is shaped by the
    postural task only."""
    hip1 = b.add(f"{prefix}_hip_y", parent, (0, 1, 0), root_offset, 2.0, 0.1,
                 home=0.4, tau=200.0)
    hip2 = b.add(f"{prefix}_hip_x", hip1, (1, 0, 0), (0, 0, -0.05), 2.0, 0.25,
                 home=0.0, tau=200.0, com_along=[0, 0, -1])
    knee = b.add(f"{prefix}_knee", hip2, (0, 1, 0), (0, 0, -0.30), 1.5, 0.30,
                 home=-0.8, tau=200.0, com_along=[0, 0, -1])
    foot = b.add(f"{prefix}_ankle_y", knee, (0, 1, 0), (0, 0, -0.30), 0.3,
                 0.02, home=0.0, tau=60.0, com_along=[0, 0, -1],
                 link_name=foot_name)
    return foot


def quadruped() -> RobotModel:
    """Floating-base quadruped/centaur lower body: pelvis + 4 legs; contact
    links named exactly as the reference (/root/reference/src/ForceAcc.cpp:58)
    and floating-base link "pelvis" (/root/reference/src/ForceAcc.cpp:29)."""
    b = _Builder(root_name="pelvis", floating=True, base_mass=25.0,
                 base_size=(0.6, 0.4, 0.2))
    _add_leg4(b, "fl", -1, (0.3, 0.2, -0.05), "foot_fl")
    _add_leg4(b, "fr", -1, (0.3, -0.2, -0.05), "foot_fr")
    _add_leg4(b, "hr", -1, (-0.3, -0.2, -0.05), "foot_hr")
    _add_leg4(b, "hl", -1, (-0.3, 0.2, -0.05), "foot_hl")
    return b.finish()


def _add_leg6(b, prefix, parent, root_offset, foot_name):
    h1 = b.add(f"{prefix}_hip_z", parent, (0, 0, 1), root_offset, 2.0, 0.08,
               tau=150.0)
    h2 = b.add(f"{prefix}_hip_x", h1, (1, 0, 0), (0, 0, -0.06), 2.0, 0.08,
               tau=150.0)
    h3 = b.add(f"{prefix}_hip_y", h2, (0, 1, 0), (0, 0, -0.06), 3.0, 0.35,
               home=-0.35, tau=250.0, com_along=[0, 0, -1])
    kn = b.add(f"{prefix}_knee", h3, (0, 1, 0), (0, 0, -0.38), 2.5, 0.38,
               home=0.7, tau=250.0, com_along=[0, 0, -1])
    a1 = b.add(f"{prefix}_ankle_y", kn, (0, 1, 0), (0, 0, -0.40), 1.0, 0.06,
               home=-0.35, tau=150.0, com_along=[0, 0, -1])
    a2 = b.add(f"{prefix}_ankle_x", a1, (1, 0, 0), (0, 0, -0.05), 0.8, 0.04,
               tau=120.0, com_along=[0, 0, -1], link_name=foot_name)
    return a2


def biped() -> RobotModel:
    """Floating-base 12-DoF biped (BASELINE config 3: double support)."""
    b = _Builder(root_name="pelvis", floating=True, base_mass=15.0,
                 base_size=(0.25, 0.3, 0.25))
    _add_leg6(b, "l_leg", -1, (0.0, 0.11, -0.05), "l_sole")
    _add_leg6(b, "r_leg", -1, (0.0, -0.11, -0.05), "r_sole")
    return b.finish()


def centaur() -> RobotModel:
    """Floating-base centaur — the reference's actual Centauro morphology
    in one model: quadruped base with contact feet named exactly as
    /root/reference/src/ForceAcc.cpp:58 (``foot_fl/fr/hr/hl``) plus the
    torso + two 7-DoF arms whose end-effectors carry the reference's QPPVM
    names ``arm1_7``/``arm2_7`` (/root/reference/src/QPPVMPlugin.cpp:129-152).
    31 joints + floating base = 37 generalized DoF."""
    b = _Builder(root_name="pelvis", floating=True, base_mass=25.0,
                 base_size=(0.6, 0.4, 0.2))
    _add_leg4(b, "fl", -1, (0.3, 0.2, -0.05), "foot_fl")
    _add_leg4(b, "fr", -1, (0.3, -0.2, -0.05), "foot_fr")
    _add_leg4(b, "hr", -1, (-0.3, -0.2, -0.05), "foot_hr")
    _add_leg4(b, "hl", -1, (-0.3, 0.2, -0.05), "foot_hl")
    torso = b.add("torso_yaw", -1, (0, 0, 1), (0.2, 0.0, 0.1), 10.0, 0.3,
                  link_name="torso", tau=200.0)
    _add_arm7(b, "arm1", torso, (0.0, 0.25, 0.25), mirror=1.0)
    _add_arm7(b, "arm2", torso, (0.0, -0.25, 0.25), mirror=-1.0)
    return b.finish()


def humanoid() -> RobotModel:
    """Floating-base 32-DoF humanoid (WALK-MAN/COMAN class, BASELINE
    configs 4-5): 2x6 legs + 3 waist + 2x7 arms + 2 neck + 1 head."""
    b = _Builder(root_name="pelvis", floating=True, base_mass=12.0,
                 base_size=(0.25, 0.3, 0.2))
    _add_leg6(b, "l_leg", -1, (0.0, 0.11, -0.05), "l_sole")
    _add_leg6(b, "r_leg", -1, (0.0, -0.11, -0.05), "r_sole")
    w1 = b.add("waist_z", -1, (0, 0, 1), (0, 0, 0.12), 4.0, 0.1, tau=300.0)
    w2 = b.add("waist_x", w1, (1, 0, 0), (0, 0, 0.08), 4.0, 0.1, tau=300.0)
    w3 = b.add("waist_y", w2, (0, 1, 0), (0, 0, 0.08), 12.0, 0.25,
               link_name="torso", tau=300.0)
    _add_arm7(b, "arm1", w3, (0.0, 0.20, 0.22))
    _add_arm7(b, "arm2", w3, (0.0, -0.20, 0.22))
    n1 = b.add("neck_z", w3, (0, 0, 1), (0, 0, 0.28), 0.6, 0.05, tau=20.0)
    n2 = b.add("neck_y", n1, (0, 1, 0), (0, 0, 0.05), 0.5, 0.05, tau=20.0)
    b.add("head", n2, (1, 0, 0), (0, 0, 0.05), 1.5, 0.12, tau=20.0,
          link_name="head")
    return b.finish()


def by_name(name: str) -> RobotModel:
    return {
        "arm7": arm7,
        "dual_arm": dual_arm,
        "quadruped": quadruped,
        "centaur": centaur,
        "biped": biped,
        "humanoid": humanoid,
    }[name]()
