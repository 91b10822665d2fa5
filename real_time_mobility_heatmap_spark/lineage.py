"""Lineage-cut strategy switch for the iterative / shared-materialization
operators.

``localCheckpoint`` stores UNREPLICATED executor-local blocks: cheap (no
distributed write) but an executor loss after the cut makes the job
unrecoverable-from-lineage (SCALE.md "Known tradeoffs"). A production
deployment with preemptible executors should flip to a reliable
``checkpoint()`` to the cluster FS. This module makes that a CONFIG
SWITCH instead of prose (r7 verdict item #9): set
``SPARK_GRAFT_CHECKPOINT_DIR`` to a cluster-visible path and every
lineage cut in the engine becomes a reliable checkpoint; leave it unset
and the cheap local form is used (the right default for local[\\*] and
non-preemptible clusters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

CHECKPOINT_DIR_ENV = "SPARK_GRAFT_CHECKPOINT_DIR"


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s logical plan, returning a DataFrame whose
    lineage starts from the materialized blocks.

    With ``SPARK_GRAFT_CHECKPOINT_DIR`` set: a reliable ``checkpoint()``
    to that directory (survives executor loss; per-cut distributed
    write). Unset: ``localCheckpoint`` (executor-local, free, lost with
    the executor). Callers choose eagerness exactly as they would on the
    underlying API: iterative fixpoint loops cut eagerly to keep plans
    constant-size; shared-materialization sites cut lazily so one
    action triggers the single write.
    """
    ck_dir = os.getenv(CHECKPOINT_DIR_ENV)
    if ck_dir:
        sc = df.sparkSession.sparkContext
        # Spark stores the live checkpoint dir FULLY QUALIFIED against
        # the default FS (e.g. hdfs://nn:8020/path/<uuid>), so comparing
        # it to the raw configured string never matches for non-file or
        # unqualified paths — and every cut would then setCheckpointDir
        # again, spawning a fresh UUID subdirectory per cut (r8 advice
        # #3). Instead this module caches the base IT last set per
        # SparkContext and only (re)sets on first use or an env change;
        # the scheme-stripped prefix check remains as a fallback for a
        # matching dir set externally (first-setter-wins inheritance of
        # a DIFFERENT dir still gets overridden — "reliable" checkpoints
        # on the wrong filesystem are the failure this switch fixes).
        key = sc.applicationId
        if _LAST_SET.get(key) != ck_dir:
            cur = sc._jsc.sc().getCheckpointDir()
            cur_s = None if cur.isEmpty() else cur.get()
            base = _strip_scheme(ck_dir).rstrip("/")
            cur_p = _strip_scheme(cur_s) if cur_s else None
            in_effect = cur_p is not None and (
                cur_p == base or cur_p.startswith(base + "/")
            )
            if not in_effect:
                sc.setCheckpointDir(ck_dir)
            _LAST_SET[key] = ck_dir
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


# SparkContext.applicationId -> the SPARK_GRAFT_CHECKPOINT_DIR value this
# module last put into effect for that context
_LAST_SET: dict[str, str] = {}


def _strip_scheme(path: str) -> str:
    for prefix in ("file://", "file:"):
        if path.startswith(prefix):
            return path[len(prefix):]
    return path
