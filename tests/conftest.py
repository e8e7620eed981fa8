"""Test harness: run all tests on a virtual 8-device CPU mesh.

The outer environment registers a remote-TPU ("axon") backend from
sitecustomize at interpreter startup and pins jax_platforms to it with an
explicit config update — env vars alone cannot undo that, so we counter it
with our own config update here, before any backend is initialized. Tests
validate semantics and multi-device sharding on host CPU devices; the real
TPU is exercised by bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
