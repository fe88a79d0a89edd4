"""Registry-wide physical-plan audit.

Every declared query's plan is scanned for patterns that do not survive a
100 TB scale-up:

- ``CartesianProduct`` / un-annotated ``BroadcastNestedLoopJoin`` — the
  pair space materialized; only queries that *declare* a tiny cross input
  (scalar subquery, literal frame) may carry one.
- ``Exchange rangepartitioning`` outside an explicitly ordered output —
  global sorts that a ``TakeOrderedAndProject`` or cluster-local sort
  should have replaced.

The per-query tests in ``test_plans.py`` pin the *good* shapes; this audit
guarantees no future registry entry quietly regresses into a scale-killer.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy family: deselect with -m 'not slow'

from shardpack_spark.queries import load_all

REG = load_all()

# Queries allowed to contain a nested-loop join because one side is a
# declared O(1)-row input (scalar subquery / literal spine / tiny cross) —
# each verified by hand: the NLJ is BuildRight over a single-row global
# aggregate or anchor vector, i.e. a broadcast of O(1) rows, not pair space.
NLJ_ALLOWED = {
    "q01_scan_count",  # 1-row count aggregates zipped via cross
    "q30b_ann_suite",  # single anchor query vector crossed with candidates
    "q33_tfidf",  # corpus-size N (1 row) crossed onto per-term stats
    "q45_outer_cross_subq",  # scalar AVG subquery (1 row) per spec
    "q52_tpch_shapes",  # Q22/Q15 variants: 1-row aggregate broadcasts (balance threshold / global MAX)
    "q62_curation_scores",  # corpus totals (1 row: Nr, Nt, V) crossed onto the DSIR ngram model
}


def _plan(spark, sf_dir, name) -> str:
    df = REG[name].builder(spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended")
    return df._jdf.queryExecution().explainString(jmode)


@pytest.mark.parametrize("name", sorted(REG))
def test_no_pair_space_materialization(spark, sf_dir, name):
    s = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in s, f"{name}: cartesian product in plan"
    if name not in NLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in s, (
            f"{name}: nested-loop join in plan — rewrite as equi/banded join "
            f"or allowlist with a justification"
        )


@pytest.mark.parametrize("name", sorted(REG))
def test_no_row_at_a_time_python(spark, sf_dir, name):
    """No registered plan may contain a row-at-a-time Python UDF
    (``BatchEvalPython``): Python in the hot path must be Arrow-batched
    (``ArrowEvalPython`` / MapInPandas / shardpack scans), which is
    ~10-100x faster.  Guards future registry entries against quietly
    shipping an F.udf."""
    s = _plan(spark, sf_dir, name)
    assert "BatchEvalPython" not in s, (
        f"{name}: row-at-a-time Python UDF in plan — use pandas_udf / "
        f"mapInPandas / built-ins instead"
    )


# Exact physical-plan ArrowEvalPython budget for the registered queries
# that use pandas UDFs.  The count is per TREE NODE in formatted mode —
# one Python-worker round trip over that input each.  r6 verdict #3:
# Catalyst's null-intolerance constraint cloned the rp-sketch UDF into an
# inferred pre-filter AND the projection (two full-corpus passes per
# side); the UDFs are now nondeterministic-marked, and this pin fails if
# any refactor reintroduces the duplication (q30b was 10 nodes before).
ARROW_EVAL_BUDGET = {
    # r9: the query-side rp-sketch moved driver-side (the single-row
    # query vector is collected once and sketched with the same seeded
    # planes in numpy — similarity.rp_lsh_topk(query_vec=...)), so only
    # the corpus-side sketch and the IVF assignment cross into Python.
    "q30b_ann_suite": 2,
    "q38_embedding_near_dup": 2,  # banded sketch: corpus side + probe side
}


@pytest.mark.parametrize("name", sorted(REG))
def test_arrow_eval_python_budget(spark, sf_dir, name):
    df = REG[name].builder(spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    s = df._jdf.queryExecution().explainString(jmode)
    n = s.count("ArrowEvalPython (")
    want = ARROW_EVAL_BUDGET.get(name, 0)
    assert n == want, (
        f"{name}: {n} ArrowEvalPython nodes, expected {want} — a pandas "
        f"UDF is being duplicated (null-intolerance cloning?) or a new "
        f"UDF entered the plan; update the budget only with a reason"
    )
