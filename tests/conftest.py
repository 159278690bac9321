"""Force tests onto a virtual 8-device CPU mesh (the standard fake-multi-chip
trick) with float64 enabled for finite-difference oracles. TPU behavior is
covered by bench.py / the driver's dryrun, not the unit suite.

NOTE: the environment pre-sets JAX_PLATFORMS=axon (single-TPU tunnel); we must
hard-override, not setdefault, or every eager op crosses the network.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "true"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# "slow" marker: the ~15 heaviest closed-loop/e2e tests (>=40 s each on this
# image's CPU; ~60% of the suite's 40-minute wall time). Quick gate for
# iterating on solver/task/model code:
#     python -m pytest tests/ -q -m "not slow"      (~15 min)
# Full runs (CI / end-of-round) stay the default — e2e behavior coverage is
# the repo's primary safety net, never skipped silently.
# ---------------------------------------------------------------------------
SLOW_TESTS = {
    "test_force_acc_trace_matches_independent_law",
    "test_leg_lift_and_replant",
    "test_dryrun_multichip_8",
    "test_humanoid_stand_on_estimated_state",
    "test_humanoid_single_support_lift_and_replant",
    "test_humanoid_push_recovery_closed_loop",
    "test_config2_dual_arm_sine_tracking",
    "test_energy_conservation_free_fall",
    "test_humanoid_double_support_stand",
    "test_ant_forceacc_stand",
    "test_centaur_stand_squat_e2e",
    "test_step_recovery_decision_channel",
    "test_humanoid_rollout_health_under_pushes",
    "test_gate_sequence_inside_horizon",
    "test_constrained_ticks_match_certified_oracle",
    "test_scenario_randomization_healthy",
    "test_quadruped_static_walk_8_strides",
    "test_humanoid_step_in_place",
    "test_published_humanoid_forceacc_stand",
    "test_capture_step_recovery_closed_loop",
    "test_rollout_one_step_matches_plant_step",
    "test_device_stream_matches_host_dispatch",
    "test_ring_exact_on_real_wbc_tick",
    "test_ring_defect_shrinks_and_payload_reported",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavyweight closed-loop/e2e test (>=40 s)")


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if item.name.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
