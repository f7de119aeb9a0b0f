"""Test configuration: force JAX onto CPU with 8 virtual devices so that all
multi-chip sharding paths (mesh, pjit, psum-BN) are exercised without TPUs —
the JAX-native equivalent of a fake distributed backend."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax

# The image's sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel); override
# explicitly — env alone is not enough once the plugin has registered.
jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
