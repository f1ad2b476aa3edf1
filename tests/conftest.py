"""Test configuration: force an 8-virtual-device CPU platform so mesh/sharding tests
run without TPU hardware (SURVEY.md section 4 test strategy).

NOTE: a site hook in this environment partially imports jax at interpreter startup,
so env vars set here are too late for platform selection — ``jax.config.update`` after
import is the reliable mechanism (XLA_FLAGS still works because backends initialise
lazily)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platform_name", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}")
    assert len(jax.devices()) == 8


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Session-scoped synthetic ASVspoof-style dataset."""
    from adfmsl.data.synthetic import SyntheticSpec, generate_fixture

    root = tmp_path_factory.mktemp("asvspoof_fixture")
    info = generate_fixture(str(root), SyntheticSpec())
    info["root"] = str(root)
    return info
