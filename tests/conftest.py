"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the multi-device CPU testing strategy the SURVEY recommends
(SURVEY.md section 4): sharding/pjit paths are validated without TPU
hardware by asking XLA for 8 host-platform devices.
"""
import os

# force CPU: the ambient environment presets JAX_PLATFORMS=axon (tunneled
# TPU); tests must run on virtual CPU devices
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    # NOTE: this machine has a single CPU core; more than 2 virtual devices
    # makes the first collective execution pathologically slow (thread
    # oversubscription in the CPU backend's barrier).  2 devices are enough
    # to validate sharding semantics; the driver's dryrun_multichip covers
    # wider meshes.
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=2').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')

# the ambient sitecustomize imports jax at interpreter startup, freezing
# JAX_PLATFORMS=axon into jax.config before this file runs — override the
# live config value, not just the env var
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')


# ---------------------------------------------------------------------------
# XLA-CPU JIT accumulation guard.  The suite compiles hundreds of
# executables (the DFT file alone ~70 lax.scan SCF variants); around the
# ~70th heavy compilation in one process, XLA:CPU segfaults INSIDE
# backend_compile (jax 0.9, reproducible: tests/test_dft_scf.py full file
# crashes at TestRangeSeparated while every subset of the file passes,
# RSS only ~4.5 GB — a JIT code-/resource-limit, not OOM).  Dropping
# compiled executables periodically keeps the process under the limit;
# cross-test executable reuse is rare (each test compiles its own
# shapes), so the recompile cost is negligible.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_CLEAR_EVERY = 15
_test_counter = {'n': 0}


@pytest.fixture(autouse=True)
def _periodic_jax_cache_clear():
    yield
    _test_counter['n'] += 1
    if _test_counter['n'] % _CLEAR_EVERY == 0:
        jax.clear_caches()
