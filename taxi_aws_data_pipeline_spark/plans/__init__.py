from .catalog import CATALOG, QuerySpec  # noqa: F401
from . import ext_catalog  # noqa: F401  (registers extension queries)
