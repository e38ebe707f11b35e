"""Data-quality constraint suite as a registered query: the
operators/constraints.py report relation against a hand-written SQL
re-expression of every check — completeness, range, domain, regex,
custom predicate, key uniqueness, referential integrity in one gate.

The in_range(0, 100000) check is deliberately failing (most orders
exceed it) so the report's violation arithmetic is exercised with
non-zero numbers, not just all-green rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iot_sensor_data_pipeline_spark.plans.registry import register
from iot_sensor_data_pipeline_spark.sources.tables import load_table

_CONSTRAINT_ORACLE = """
SELECT 'not_null(o_custkey)' AS "check", 'row' AS kind, 'o_custkey' AS "column",
       COUNT(*) AS n_rows,
       CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 END), 0) AS BIGINT) AS n_violations,
       COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 END), 0) = 0 AS passed
FROM orders
UNION ALL
SELECT 'in_range(o_totalprice)', 'row', 'o_totalprice',
       COUNT(*),
       CAST(COALESCE(SUM(CASE WHEN (o_totalprice < 0 OR o_totalprice > 100000)
                                    AND o_totalprice IS NOT NULL THEN 1 END), 0) AS BIGINT),
       COALESCE(SUM(CASE WHEN (o_totalprice < 0 OR o_totalprice > 100000)
                          AND o_totalprice IS NOT NULL THEN 1 END), 0) = 0
FROM orders
UNION ALL
SELECT 'in_set(o_orderstatus)', 'row', 'o_orderstatus',
       COUNT(*),
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                                    AND o_orderstatus IS NOT NULL THEN 1 END), 0) AS BIGINT),
       COALESCE(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                          AND o_orderstatus IS NOT NULL THEN 1 END), 0) = 0
FROM orders
UNION ALL
SELECT 'order_year_sane', 'row', '*',
       COUNT(*),
       CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(
            year(o_orderdate) BETWEEN 1990 AND 2005, false) THEN 1 END), 0) AS BIGINT),
       COALESCE(SUM(CASE WHEN NOT COALESCE(
            year(o_orderdate) BETWEEN 1990 AND 2005, false) THEN 1 END), 0) = 0
FROM orders
UNION ALL
SELECT 'unique(o_orderkey)', 'unique', 'o_orderkey',
       CAST(SUM(c) AS BIGINT),
       CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS BIGINT),
       COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) = 0
FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)
UNION ALL
SELECT 'ref_integrity(o_custkey)', 'ref', 'o_custkey',
       (SELECT COUNT(*) FROM orders),
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_custkey IS NOT NULL
               AND o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT),
       (SELECT COUNT(*) FROM orders
        WHERE o_custkey IS NOT NULL
          AND o_custkey NOT IN (SELECT c_custkey FROM customer)) = 0
"""


# rotated INTO the driver gate in r08
@register(
    "orders_constraint_report",
    oracle=_CONSTRAINT_ORACLE,
    tags=("quality", "constraints"),
)
def orders_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-check suite over orders: all row-level checks share ONE
    scan; uniqueness adds the key group-by; referential integrity an
    anti join against customer (broadcast at dim size, bloom-prunable
    at fact size)."""
    from iot_sensor_data_pipeline_spark.operators.constraints import (
        check_suite,
        in_range,
        in_set,
        not_null,
        ref_integrity,
        satisfies,
        unique,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return check_suite(
        orders,
        [
            not_null("o_custkey"),
            in_range("o_totalprice", 0, 100000),
            in_set("o_orderstatus", ["O", "F", "P"]),
            satisfies("year(o_orderdate) BETWEEN 1990 AND 2005", "order_year_sane"),
            unique("o_orderkey"),
            ref_integrity("o_custkey", customer, "c_custkey"),
        ],
    )
