"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Multi-chip sharding is validated with XLA host-device simulation
(``--xla_force_host_platform_device_count=8``) instead of a real pod,
matching the build plan in SURVEY.md §4.
"""

import os

# Must run before jax is used anywhere. Force-override: the ambient
# environment pins JAX_PLATFORMS to the real TPU (axon) and the plugin
# ignores the env var, so pin the platform through jax.config too.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def rng():
    import jax
    return jax.random.PRNGKey(0)
