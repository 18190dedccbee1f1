"""Lint-capture seam for ``localCheckpoint`` sub-plans.

Why this exists (round-6 verdict, "plan-lint blind spot"): an **eager**
``df.localCheckpoint()`` at query-construction time materializes the
sub-plan immediately, so by the time ``tests/test_plan_lint.py`` explains
the query's final plan, the checkpointed side appears only as an opaque
``Scan ExistingRDD`` — any scale hazard inside it (a cartesian, a
single-partition window) is invisible to the lint.

The naive fix — an env flag that skips checkpointing entirely — breaks the
iterative operators: connected-components / BFS / pointer-doubling loops
EXECUTE during construction (convergence ``collect`` per round), and the
whole reason they checkpoint is that un-truncated lineage grows
geometrically per round (the r6-diagnosed driver OOM during codegen).
Running them un-checkpointed under the lint would re-introduce exactly
that failure at lint time.

So instead of *removing* the checkpoint, the lint *captures* the
pre-checkpoint plan: :func:`capture_subplans` patches
``DataFrame.localCheckpoint`` to append the un-checkpointed DataFrame's
formatted physical plan to a sink before delegating to the real method.
The lint then applies the same two hazard rules to the final plan AND
every captured sub-plan, restoring the "full plan is checked" guarantee
without changing execution semantics or economics — and without a
convention call sites could forget: patching the method itself means no
present or future ``localCheckpoint`` call can evade capture. The patch
is installed only inside the lint test's context manager; production
paths never touch this module.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The ``formatted`` explain string of *df* (same text .explain prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _checkpoint_classes() -> list[type]:
    """Every class that DEFINES localCheckpoint in this PySpark. Spark 4's
    ``pyspark.sql.DataFrame`` is a dispatch base; the classic session
    instantiates ``pyspark.sql.classic.dataframe.DataFrame`` whose own
    method would shadow a base-class patch (verified: patching only the
    base captured nothing)."""
    classes = [DataFrame]
    try:
        from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

        classes.append(ClassicDF)
    except ImportError:
        pass
    return [c for c in classes if "localCheckpoint" in vars(c)]


@contextmanager
def capture_subplans(into: list[str]):
    """While active, every ``DataFrame.localCheckpoint`` call first appends
    the un-checkpointed plan's formatted explain text to *into*, then
    checkpoints as usual. Reentrant-safe (restores the previous methods)."""
    targets = _checkpoint_classes()
    origs = {cls: cls.localCheckpoint for cls in targets}

    def make_capturing(orig):
        # *args/**kwargs: PySpark 4.1's signature is (eager=True,
        # storageLevel=None) and may grow — a narrowed wrapper would turn
        # any richer call into a lint-only TypeError (r7 review)
        def capturing(self, *args, **kwargs):
            into.append(formatted_plan(self))
            return orig(self, *args, **kwargs)

        return capturing

    for cls, orig in origs.items():
        cls.localCheckpoint = make_capturing(orig)
    try:
        yield into
    finally:
        for cls, orig in origs.items():
            cls.localCheckpoint = orig
