"""Correlated scalar subqueries, decorrelated by Catalyst.

The classic analyst shape "rows above their group's average" is most
naturally written as a correlated scalar subquery — and naively executed
it is O(N) subqueries. Catalyst's subquery decorrelation rewrites it into
a grouped aggregate joined back on the correlation key: one aggregation,
one join, no per-row re-execution and no cartesian. This module registers
the query AS SQL (the DataFrame API can of course express the decorrelated
form directly — composite.py does — but the point here is that the engine
accepts the declarative form and plans the scalable one; the plan audit in
tests/test_plans.py pins it).

Exactness: the "1.5x the customer's average price" predicate is evaluated
entirely in scaled-long integer space (functions/numeric.py idiom) via
cross-multiplication — ``2 * price * n > 3 * sum(price)`` avoids both the
division and any float comparison at the boundary, so Spark and DuckDB
agree bitwise on exactly which rows qualify. Both engines run the
IDENTICAL SQL text.

Reference parity: [TGT] — the reference has no query language; this is
engine surface beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from broadway_kinesis_spark.functions.numeric import sql_lscale
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

# Orders priced above 1.5x their customer's average order price, decided in
# exact 1e-6-unit integer space: price*2*n(cust) > 3*sum(cust). Range: a
# ~6e11 scaled price times 2n stays far under 2^63 for any realistic
# per-customer order count (overflow only past ~7.6e6 orders/customer).
# The table name is templated: DuckDB reads the driver-registered `orders`
# view, Spark reads a namespaced temp view (ADVICE r3: registering a view
# literally named 'orders' silently shadowed the name in the shared
# session catalog for every later spark.sql in the same session).
_SQL_TEMPLATE = """
SELECT o_orderkey, o_custkey, {price_mu} AS price_mu
FROM {tbl} o
WHERE {price_mu_o} * 2 *
      (SELECT COUNT(*) FROM {tbl} o2 WHERE o2.o_custkey = o.o_custkey)
    > 3 * (SELECT SUM({price_mu_o2})
           FROM {tbl} o2 WHERE o2.o_custkey = o.o_custkey)
"""


def _sql(tbl: str) -> str:
    return _SQL_TEMPLATE.format(
        tbl=tbl,
        price_mu=sql_lscale("o_totalprice"),
        price_mu_o=sql_lscale("o.o_totalprice"),
        price_mu_o2=sql_lscale("o2.o_totalprice"),
    )


_SPARK_VIEW = "_bks_orders_subq"


@query("subquery_correlated_avg", oracle=_sql("orders"))
def subquery_correlated_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders >1.5x their customer's average price, written as two
    correlated scalar subqueries over the same correlation key and handed
    to Catalyst verbatim (identical SQL text both engines, up to the view
    name). The optimizer decorrelates both into one grouped aggregate on
    o_custkey joined back to orders — the plan that survives 100 TB — and
    the integer cross-multiplied predicate keeps the qualifying row set
    bit-identical across engines.

    The temp view is namespaced and dropped before returning: ``spark.sql``
    analyzes eagerly, so the returned DataFrame's resolved plan no longer
    needs the catalog entry and the shared session is left unchanged.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView(_SPARK_VIEW)
    try:
        return spark.sql(_sql(_SPARK_VIEW))
    finally:
        spark.catalog.dropTempView(_SPARK_VIEW)
