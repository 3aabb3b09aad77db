from .catalog import QUERIES, QueryDef, query, load_all  # noqa: F401
