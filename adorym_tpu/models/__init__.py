from . import base, ptychography, regularizers  # noqa: F401
