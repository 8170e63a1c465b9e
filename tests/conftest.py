"""Test harness: force an 8-device virtual CPU platform so every
sharding/collective path gets exercised without TPU hardware
(strictly more coverage than the reference, which has no distributed tests —
SURVEY.md §4)."""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')
