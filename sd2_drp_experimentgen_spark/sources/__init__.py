from .tables import load_events, load_table  # noqa: F401
