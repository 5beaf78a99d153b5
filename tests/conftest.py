"""Test configuration: force the JAX CPU backend with 8 virtual devices.

The container's sitecustomize registers the remote 'axon' TPU platform and
pins ``JAX_PLATFORMS=axon`` at interpreter startup, so an env-var override
is not enough — we must update the jax config after import. Tests must never
compete for the single remote TPU tunnel; they exercise sharding/pjit logic
on 8 virtual CPU devices instead (the fake-multichip facility the reference
lacks, SURVEY.md §4). Benchmarks (bench.py) do NOT import this and run on
the real chip.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# repo root on sys.path so `torch_nerf_tpu` imports without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() >= 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)
