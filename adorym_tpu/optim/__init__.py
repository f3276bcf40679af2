from . import optimizers, params  # noqa: F401
from .optimizers import OptSpec, opt_apply, opt_init, tree_apply, tree_init  # noqa: F401
