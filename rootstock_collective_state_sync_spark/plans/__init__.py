"""Query plans: the engine's declarative query surface.

Every operator from SURVEY.md §2 is expressed as a DataFrame plan
(Catalyst does the physical planning) and registered in
:mod:`.registry` together with an ANSI-SQL oracle equivalent for
DuckDB-based correctness checking.
"""

from rootstock_collective_state_sync_spark.plans.tables import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
