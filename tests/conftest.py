"""Test harness: force an 8-device virtual CPU platform so every
sharding/collective path gets exercised without TPU hardware
(strictly more coverage than the reference, which has no distributed tests —
SURVEY.md §4).

Note: the environment's sitecustomize exports JAX_PLATFORMS=axon (the real
TPU tunnel); tests must hard-override it, not setdefault.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
