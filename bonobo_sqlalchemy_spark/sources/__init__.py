from .files import TABLES, load_table, register_views
from .select import Select

__all__ = ["Select", "TABLES", "load_table", "register_views"]
