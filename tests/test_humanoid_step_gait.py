"""Humanoid step-in-place through the GAIT engine (VERDICT r3 next #2b).

One full stride of the crawl-gait chain (runtime/gait.py) on the flagship
humanoid: weight shift -> unload -> 4 cm swing-sole lift -> lower ->
reload, driven by the reference-faithful sync_model state tier
(/root/reference/src/ForceAcc.cpp:256-282) rather than simulator ground
truth. Covers the GaitScript boundary logic (re-anchor with pinned
lateral reference, per-stride geometry from the live state) on the biped;
the multi-stride quadruped walk is tests/test_gait_walk.py. Round 5
FIXED the 2nd-weight-shift failure that used to block chaining (static
ForceReg share + CoM servo + CoPBox + projected unload gate — the
double-distance transfer now completes cleanly, see docs/ARCHITECTURE.md
"Biped weight transfer"); the remaining multi-stride blocker (stance-
sole outboard migration during extended single support) is pinned by
the strict-xfail tests/test_humanoid_walk.py.
"""
import numpy as np
import jax.numpy as jnp

from qppvm_tpu.model import kinematics, zoo
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.contact_switch import LegLiftPhases
from qppvm_tpu.runtime.estimator import sync_model_state
from qppvm_tpu.runtime.gait import GaitScript
from qppvm_tpu.runtime.robot_interface import SimRobot, standing_state

CONTACTS = ("l_sole", "r_sole")
PATCH = [[0.10, 0.05, 0.0], [0.10, -0.05, 0.0],
         [-0.06, 0.05, 0.0], [-0.06, -0.05, 0.0]]


def test_humanoid_step_in_place():
    model = zoo.humanoid()
    plugin = ForceAccPlugin(model, contact_links=CONTACTS,
                            waist_link="pelvis", iters=80,
                            switchable_contacts=True,
                            use_friction_cones=True, mu=0.6, wrench_dim=6)
    st = standing_state(model, CONTACTS)
    robot = SimRobot(model, state=st, dt=1e-3, substeps=2,
                     contact_links=CONTACTS, ground_z=0.0,
                     contact_offsets={c: PATCH for c in CONTACTS})
    refs, warm, initial_waist = plugin.on_start(robot.state)

    phases = LegLiftPhases(settle=150, shift=900, dwell=200, unload=180,
                           lift=250, hold=150, lower=250, reload=200)
    gait = GaitScript(model, plugin, refs, initial_waist,
                      order=("l_sole", "r_sole"), stride=(0.0, 0.0),
                      n_strides=1, phases=phases, shift_mode="centroid",
                      lift_height=0.04, swing_kp=100.0, swing_w=3.0,
                      tail=300)

    l_idx = model.link_index("l_sole")
    lift_z, lift_fz = [], []
    n_fail = 0
    s = None
    for i in range(gait.total):
        state = sync_model_state(robot, model)
        refs_t = gait.refs_at(i, state)
        s = gait._script
        tau, warm, aux = plugin.control_loop(state, refs_t, warm)
        assert not bool(aux.solver_failed), \
            f"tick {i} prim={float(aux.prim_res):.2e}"
        robot.set_reference(tau_ref=tau, q_ref=state.q)
        robot.move()
        if s is not None and s.t_hold0 <= i < s.t_lower0:
            kin = kinematics.fk(model, robot.state)
            lift_z.append(float(kin.p[l_idx][2]))
            lift_fz.append(float(np.asarray(aux.wrenches)[0, 2]))

    # the sole physically lifted and carried no commanded force
    assert np.mean(lift_z) > 0.02, np.mean(lift_z)
    assert np.max(np.abs(lift_fz)) < 1e-2, np.max(np.abs(lift_fz))
    # upright, double support recovered, both soles loaded. The gait tail
    # holds the final stride's refs (waist still shifted over the stance
    # sole), so the stand ends leaning over that foot — recentering after
    # the final stride is documented open work (docs/ARCHITECTURE.md).
    assert float(robot.state.base_rot[2, 2]) > 0.85
    w_final = np.asarray(aux.wrenches)
    assert np.all(w_final[:, 2] > 10.0 - 1e-3), w_final[:, 2]
