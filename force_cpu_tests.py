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

if os.environ.get("FAB_TPU_TESTS_REEXECED") != "1":
    # Re-exec UNCONDITIONALLY (not only when JAX_PLATFORMS/XLA_FLAGS look wrong):
    # a caller exporting JAX_PLATFORMS=cpu + the XLA flag themselves used to skip
    # the re-exec, which left PALLAS_AXON_POOL_IPS set — the sitecustomize then
    # registered the remote TPU anyway and the whole suite silently ran over the
    # tunnel (1 device, wrong tolerances, ~3x slower, competing with training
    # jobs). Round-5 lost a full suite run to exactly that.
    env = dict(os.environ)
    env["FAB_TPU_TESTS_REEXECED"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + _WANT_XLA).strip()
    # Disable TPU plugin registration hooks (see /root/.axon_site/sitecustomize.py).
    env["PALLAS_AXON_POOL_IPS"] = ""
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
