"""Query plans: the registry of named queries with their DuckDB oracle
SQL. Importing this package populates the registry."""

from iot_sensor_data_pipeline_spark.plans.registry import (
    EXTENDED_REGISTRY,
    REGISTRY,
    RegisteredQuery,
    register,
    register_extended,
)

# populate the registry (import order = SURVEY.md §7 milestone order)
from iot_sensor_data_pipeline_spark.plans import queries_reference  # noqa: E402,F401
from iot_sensor_data_pipeline_spark.plans import queries_scalars  # noqa: E402,F401
from iot_sensor_data_pipeline_spark.plans import queries_relational  # noqa: E402,F401
from iot_sensor_data_pipeline_spark.plans import queries_relational2  # noqa: E402,F401
from iot_sensor_data_pipeline_spark.plans import queries_pipeline  # noqa: E402,F401
from iot_sensor_data_pipeline_spark.plans import queries_analytics  # noqa: E402,F401
from iot_sensor_data_pipeline_spark.plans import queries_tpch_full  # noqa: E402,F401
from iot_sensor_data_pipeline_spark.plans import queries_pipeline_ext  # noqa: E402,F401
from iot_sensor_data_pipeline_spark.plans import queries_constraints  # noqa: E402,F401
from iot_sensor_data_pipeline_spark.plans import queries_coverage_ext  # noqa: E402,F401
from iot_sensor_data_pipeline_spark.plans import queries_mutations  # noqa: E402,F401
from iot_sensor_data_pipeline_spark.plans import queries_matview  # noqa: E402,F401

__all__ = [
    "EXTENDED_REGISTRY",
    "REGISTRY",
    "RegisteredQuery",
    "register",
    "register_extended",
]
