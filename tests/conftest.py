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
# persistent compilation cache shared across the per-file subprocess batches
# of tests/run_suite.py (and across re-runs): most tests' programs compile
# once ever, which both speeds the suite up and shrinks the number of live
# LLVM JIT compilations per process (the sporadic-segfault surface).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
