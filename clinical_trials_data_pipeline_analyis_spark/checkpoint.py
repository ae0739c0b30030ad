"""Lineage truncation with a cluster-reliable upgrade path.

Iterative operators (connected-components star loops, the BPE merge
loop, perceptron epochs) and guarded fan-out stages (the RHP candidate
budget, SemDeDup's blocked frame, MinHash signature reuse) all cut
lineage so a self-join or a loop iteration does not replay the plan
that produced its input. On ``local[]`` the right tool is
``DataFrame.localCheckpoint``: zero I/O, blocks live in the single
JVM's block manager.

On a real cluster that choice has a named failure mode:
``localCheckpoint`` blocks are stored on executors NON-REPLICATED, and
the truncated plan is the only lineage — lose one executor (spot
reclaim, OOM kill) and every job consuming the checkpointed frame dies
with a FetchFailed that Spark cannot recompute around. A 100-TB run on
1000 executors WILL lose executors.

This module is the single switch between the two modes. Every
truncation point in the engine routes through :func:`cut_lineage`,
which upgrades to a RELIABLE ``DataFrame.checkpoint()`` (written to the
fault-tolerant checkpoint directory, typically HDFS/S3) whenever the
application has configured one::

    spark.sparkContext.setCheckpointDir("hdfs:///tmp/engine-ckpt")

With no checkpoint directory configured (the local[] default) behavior
is byte-identical to the direct ``localCheckpoint`` calls this helper
replaced. Results are identical either way — only the storage of the
materialized blocks (and therefore executor-loss survivability)
changes; ``tests/test_round9_ops.py`` proves value-equality of both
modes in a subprocess so the shared test session's mode is untouched.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def cut_lineage(
    eager: bool = True,
    storage_level: Optional[StorageLevel] = None,
) -> Callable[[DataFrame], DataFrame]:
    """Truncation point: ``df.transform(cut_lineage())``.

    Returns a function suitable for ``DataFrame.transform`` so call
    sites keep their method-chain shape. Reliable
    (``DataFrame.checkpoint``) when the SparkContext has a checkpoint
    directory configured; ``localCheckpoint`` otherwise.

    ``storage_level`` only applies to the local mode (reliable
    checkpoints are files, not block-manager entries; the level is
    moot there). ``eager=False`` defers materialization to the first
    action in both modes.
    """

    def _apply(df: DataFrame) -> DataFrame:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is not None:
            return df.checkpoint(eager=eager)
        if storage_level is not None:
            return df.localCheckpoint(eager=eager, storageLevel=storage_level)
        return df.localCheckpoint(eager=eager)

    return _apply
