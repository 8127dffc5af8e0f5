"""Oracle-checked query catalog (driver contract, SURVEY.md §5.1).

Every implemented operator from SURVEY.md §2 gets a named entry here: a
PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL can express
it) an equivalent ANSI-SQL string for the DuckDB oracle.
"""

from .catalog import CATALOG, QuerySpec, oracle_sql, queries  # noqa: F401
