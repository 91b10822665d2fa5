from .tables import TABLES, load_table, pings_from_events  # noqa: F401
