"""Test fixtures. CPU-only JAX env is enforced by the force_cpu_tests plugin
(loaded via pytest.ini addopts), which re-execs pytest with a virtual 8-device CPU
mesh before any backend initialises."""
import jax
import pytest


@pytest.fixture
def key():
    return jax.random.key(0)
