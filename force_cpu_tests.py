"""Early pytest plugin: re-exec the test run in a CPU-only JAX environment.

The container force-registers a remote TPU backend in every Python process at
interpreter start (sitecustomize), which makes unit tests unusably slow and cannot be
undone once jax's backends initialise. This plugin is loaded via ``addopts = -p
force_cpu_tests`` (pytest.ini) — early enough that fd-level capture has not started —
and re-execs pytest once with JAX pinned to a virtual 8-device CPU mesh (SURVEY §4's
distributed-test strategy).
"""
import os
import sys

_WANT_XLA = "--xla_force_host_platform_device_count=8"

if os.environ.get("FAB_TPU_TESTS_REEXECED") != "1" and (
    os.environ.get("JAX_PLATFORMS") != "cpu"
    or "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", "")
):
    env = dict(os.environ)
    env["FAB_TPU_TESTS_REEXECED"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + _WANT_XLA).strip()
    # Disable TPU plugin registration hooks (see /root/.axon_site/sitecustomize.py).
    env["PALLAS_AXON_POOL_IPS"] = ""
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
