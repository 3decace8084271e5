from .catalog import QUERIES, QuerySpec, load_table, register  # noqa: F401
from . import catalog_ext  # noqa: F401,E402  (registers extension queries)
from . import catalog_ext2  # noqa: F401,E402  (round-2 extension queries)
