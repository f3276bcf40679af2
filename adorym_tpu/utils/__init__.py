from . import initialize  # noqa: F401
