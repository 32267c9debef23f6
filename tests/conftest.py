"""Test configuration: force an 8-virtual-device CPU platform so mesh /
sharding logic is exercised without TPU hardware (the driver separately
dry-runs the multi-chip path via __graft_entry__.dryrun_multichip)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize registers the axon TPU backend before conftest
# runs; jax.config still lets us pin the platform post-import.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the @pytest.mark.slow tier (flagship-dims parity etc.; "
             "adds ~50 min on a 1-core host — see CLAUDE.md 'Test tiers')")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng_seed():
    return 0
