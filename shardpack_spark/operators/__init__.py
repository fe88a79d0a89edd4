"""Library operators with no single-call Catalyst equivalent.

Each is a DataFrame -> DataFrame function built from Catalyst built-ins
(joins / windows / higher-order functions) — no custom plan rules, no
driver-side collects, shard-parallel by construction.
"""

from shardpack_spark.operators.asof import asof_join  # noqa: F401
