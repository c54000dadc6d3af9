"""Test configuration: force an 8-device virtual CPU backend.

Multi-chip behavior (mesh sharding, psum grad reduction, replicated-state
invariants) is tested on virtual CPU devices, the JAX idiom for testing
SPMD code without hardware (`--xla_force_host_platform_device_count`).
Must run before jax initializes its backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: the env var JAX_PLATFORMS is overridden by this image's axon TPU
# plugin; jax.config is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the big SPMD train-step programs take many
# minutes to compile on this single-core host; cache them across test runs.
# CAVEAT: XLA:CPU AOT cache entries record host CPU features and have
# crashed with SIGILL when the recorded features mismatch (warnings about
# "+prefer-no-scatter ... could lead to execution errors such as SIGILL").
# Set PIX2PIX3D_NO_COMPILE_CACHE=1 to bypass if a test dies mid-run.
if not os.environ.get("PIX2PIX3D_NO_COMPILE_CACHE"):
    os.makedirs("/root/.cache/jax_test_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_test_cache")
    # 1s threshold: the fast tier compiles hundreds of small programs on
    # this single core; at the old 5s floor they recompiled every run
    # (~30 min "warm" tiers, VERDICT r4 weak #8).  Disk is cheap here.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
