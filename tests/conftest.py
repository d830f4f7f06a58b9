"""Test configuration: force JAX onto an 8-device virtual CPU mesh so
sharding/mesh tests run anywhere (the driver separately dry-runs the
multi-chip path)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_dir():
    if not REFERENCE.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE


@pytest.fixture(scope="session")
def example_pdb(reference_dir):
    p = reference_dir / "examples" / "kinase" / "1OL5_A.pdb"
    if not p.exists():
        pytest.skip("example pdb missing")
    return str(p)


@pytest.fixture(scope="session")
def example_complex_pdb(reference_dir):
    p = reference_dir / "examples" / "dna_rna" / "1H9D.pdb1"
    if not p.exists():
        pytest.skip("example pdb missing")
    return str(p)
