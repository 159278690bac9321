"""Scenario config system: YAML -> ScenarioConfig -> runnable objects.

The shipped configs/ files cover BASELINE.json's five configs; each must
load, validate, and build (model, plugin) without error. Full closed-loop
behavior of the built scenarios is covered by the e2e tests; here we check
the declarative layer itself (SURVEY.md §5 "config/flag system" upgrade over
the reference's hardcoded constants,
/root/reference/src/QPPVMPlugin.cpp:50-51,105-106).
"""
import glob
import os

import pytest

from qppvm_tpu import config as cfgmod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*.yaml")))


def test_configs_shipped():
    names = [os.path.basename(p) for p in CONFIGS]
    assert len(CONFIGS) >= 5, names
    for i in range(1, 6):
        assert any(n.startswith(f"config{i}_") for n in names), names


@pytest.mark.parametrize("path", CONFIGS, ids=os.path.basename)
def test_load_and_build(path):
    cfg = cfgmod.load_scenario(path)
    assert cfg.name
    model = cfgmod.build_model(cfg)
    plugin = cfgmod.build_plugin(cfg, model)
    assert plugin.model is model
    if cfg.plugin.type == "force_acc":
        assert model.floating
        sim = cfgmod.build_sim(cfg, model)
        assert sim.contact_links == cfg.plugin.contact_links


def test_config2_reference_gains():
    """config 2 must carry the reference's exact constants
    (/root/reference/src/QPPVMPlugin.cpp:105-106,136-137,188)."""
    cfg = cfgmod.load_scenario(os.path.join(REPO, "configs",
                                            "config2_dual_arm.yaml"))
    assert cfg.plugin.cart_stiffness == 700.0
    assert cfg.plugin.cart_damping == 70.0
    assert cfg.plugin.joint_stiffness == 5.0
    assert cfg.plugin.joint_damping == 2.0
    assert cfg.solver.eps == 1.0
    assert cfg.plugin.sine_ref


def test_config3_runs_one_tick():
    cfg = cfgmod.load_scenario(os.path.join(REPO, "configs",
                                            "config3_biped.yaml"))
    model, plugin, robot = cfgmod.build_scenario(cfg)
    refs, warm, start = plugin.on_start(robot.state)
    tau, warm, aux = plugin.control_loop(robot.state, refs, warm)
    assert tau.shape == (model.nj,)
    assert not bool(aux.solver_failed)


def test_unknown_keys_rejected():
    with pytest.raises(ValueError, match="unknown"):
        cfgmod.ScenarioConfig.from_dict(
            {"robot": {"zoo": "arm7", "bogus": 1}})


def test_robot_config_exclusive():
    with pytest.raises(ValueError, match="exactly one"):
        cfgmod.ScenarioConfig.from_dict({"robot": {}})


def test_mpc_build(tmp_path):
    cfg = cfgmod.load_scenario(os.path.join(REPO, "configs",
                                            "config5_mpc.yaml"))
    assert cfg.mpc.enabled and cfg.mpc.n_samples == 4096
    # scale down for the test and build the planner
    cfg.mpc.n_samples = 4
    cfg.mpc.horizon = 2
    model = cfgmod.build_model(cfg)
    plugin = cfgmod.build_plugin(cfg, model)
    mpc = cfgmod.build_mpc(cfg, plugin)
    assert mpc.init_plan().shape == (2, mpc.mppi.nu)


def test_roundtrip_dict():
    cfg = cfgmod.load_scenario(os.path.join(REPO, "configs",
                                            "config4_humanoid.yaml"))
    d = cfg.to_dict()
    cfg2 = cfgmod.ScenarioConfig.from_dict(d)
    assert cfg2.plugin.wrench_dim == 6
    assert cfg2.plugin.switchable_contacts


def test_solver_opts_passthrough():
    """SolverConfig.opts flows into the plugin's solver profile (the config
    analog of QPOases_sot::setOptions,
    /root/reference/src/QPPVMPlugin.cpp:190-196)."""
    from qppvm_tpu.config import ScenarioConfig, build_model, build_plugin

    cfg = ScenarioConfig.from_dict({
        "robot": {"zoo": "arm7"},
        "plugin": {"type": "qppvm", "left_ee": "arm1_7",
                   "right_ee": "arm1_7"},
        "solver": {"eps": 1.0, "iters": 40,
                   "opts": {"rho_updates": 0, "method": "pdip",
                            "pdip_iters": 30}},
    })
    model = build_model(cfg)
    plugin = build_plugin(cfg, model)
    assert plugin.solver_opts["rho_updates"] == 0
    assert plugin.solver_opts["method"] == "pdip"
    assert plugin.solver_opts["pdip_iters"] == 30
