"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(parallel/) compile and execute without TPU hardware. This must happen before
jax initializes a backend, hence the env mutation at import time.
"""

import os
import sys
from pathlib import Path

# Force CPU: the environment may pre-set JAX_PLATFORMS (e.g. a TPU tunnel
# plugin), so setdefault is not enough.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import pytest


@pytest.fixture
def demo_csv() -> Path:
    return REPO_ROOT / "examples" / "demo_data" / "demo_stock.csv"


@pytest.fixture
def tiny_csv(tmp_path) -> Path:
    p = tmp_path / "test_data.csv"
    p.write_text(
        "Date,Value1,Value2\n"
        "2024-01-01,100,200\n"
        "2024-01-02,105,210\n"
        "2024-01-03,103,220\n"
        "2024-01-04,108,215\n"
    )
    return p
