"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Multi-chip sharding is validated with XLA host-device simulation
(``--xla_force_host_platform_device_count=8``) instead of a real pod,
matching the build plan in SURVEY.md §4.
"""

import os

# Must run before jax is imported anywhere.
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def rng():
    import jax
    return jax.random.PRNGKey(0)
