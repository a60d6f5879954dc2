from map_reduce_lite_spark.relational.tables import load_table, load_tables, TABLE_NAMES  # noqa: F401
from map_reduce_lite_spark.relational.queries import RELATIONAL_QUERIES  # noqa: F401
