"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax import so
mesh/sharding tests run without TPU hardware (SURVEY.md section 4 test strategy)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Session-scoped synthetic ASVspoof-style dataset."""
    from adfmsl.data.synthetic import SyntheticSpec, generate_fixture

    root = tmp_path_factory.mktemp("asvspoof_fixture")
    info = generate_fixture(str(root), SyntheticSpec())
    info["root"] = str(root)
    return info
