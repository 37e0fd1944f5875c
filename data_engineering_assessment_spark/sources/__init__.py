from .tables import load_table, register_corpus  # noqa: F401
