from . import losses  # noqa: F401 — registers all loss types
