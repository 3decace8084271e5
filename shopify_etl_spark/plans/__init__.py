from .catalog import QUERIES, QuerySpec, load_table, register  # noqa: F401
