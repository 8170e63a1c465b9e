"""Native (C++) runtime components, loaded via ctypes with pure-python
fallbacks. Build once with `python -m ld_tpu.native.build` (or implicitly on
first use)."""
from .build import load_cocomatch  # noqa: F401
