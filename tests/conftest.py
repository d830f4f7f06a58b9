"""Test configuration: force JAX onto an 8-device virtual CPU mesh so
sharding/mesh tests run anywhere (the driver separately dry-runs the
multi-chip path)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# force CPU for tests even when a TPU platform is preconfigured (the site
# customization imports jax before conftest, so the env var alone is too
# late — use the runtime config). The driver benchmarks on real TPU
# separately; set PESTO_TEST_TPU=1 to run tests on the TPU backend.
if not os.environ.get("PESTO_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

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
