"""Test harness: force CPU with 8 virtual devices (multi-chip sharding tests
run on a virtual mesh, per the driver contract), and expose the read-only
reference implementation at /root/reference as a numerical oracle."""

import os
import sys
import types

# Must run before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

REFERENCE_ROOT = "/root/reference"


def _install_yacs_stub():
    """The reference factories do ``from yacs.config import CfgNode``; yacs
    is not installed here, so provide a minimal attribute-dict stand-in."""
    if "yacs" in sys.modules:
        return

    class CfgNode(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    yacs = types.ModuleType("yacs")
    cfg = types.ModuleType("yacs.config")
    cfg.CfgNode = CfgNode
    yacs.config = cfg
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = cfg


def reference_modeling():
    """Import the reference torch modeling package (oracle, never copied)."""
    _install_yacs_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import monoport.lib.modeling as ref_modeling  # noqa: F401
    return ref_modeling


import pytest  # noqa: E402
import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU platform and overrides
# JAX_PLATFORMS; pin CPU explicitly so tests are deterministic and the
# 8-virtual-device mesh is available.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against fp32 torch; the default matmul precision on
# this backend is reduced (bf16-class), so pin full precision for tests.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def ref():
    """Reference torch modeling package."""
    return reference_modeling()
