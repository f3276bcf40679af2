from . import fourier, image, patches, propagate, rotate  # noqa: F401
