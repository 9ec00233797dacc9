"""Test configuration: run the whole suite on a virtual 8-device CPU
mesh so single-chip kernels and multi-chip shardings are both covered
without TPU hardware (SURVEY.md §4).

Note: this environment's sitecustomize registers a TPU PJRT plugin and
sets JAX_PLATFORMS=axon for every process, so we must override via
jax.config (env vars alone are read too early).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# Heavy tests (>~7 s on the CPU mesh, measured via --durations) carry
# the `slow` marker, centralized here so the fast gate stays accurate:
#   pytest -m "not slow"   -> < 5 min iteration loop
#   pytest                 -> full suite (nightly / pre-merge)
_SLOW = {
    "test_scaling_harness_runs",
    "test_odometry_ate_within_bound",
    "test_ring_icp_matches_single",
    "test_gicp_pool_path",
    "test_icp_pool_matches_rungrid",
    "test_colored_icp_pool_path",
    "test_colored_gicp_interpret_parity",
    "test_registration_surfaces_drops_and_regrows",
    "test_interpret_kernel_parity",
    "test_grid_filterreg_converges",
    "test_pallas_interpret_matches_xla",
    "test_fused_icp_matches_legacy_metrics",
    "test_knn_matches_bruteforce",
    "test_fused_icp_converges",
    "test_icp_uses_rollgrid_large_cloud",
    "test_matches_brute_force",
    "test_pose_graph_sharded_matches_single",
    "test_ba_sharded_matches_single",
    "test_bucket_matches_dense",
    "test_voxelgrid_bucket_route",
    "test_process_frame_and_extract",
    "test_weighted_odometry_runs",
    "test_recovers_small_motion",
    "test_scalable_tsdf",
    "test_voxelgrid_roundtrip",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy test (excluded by -m 'not slow')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW:
            item.add_marker(pytest.mark.slow)
