from . import v2  # noqa: F401
