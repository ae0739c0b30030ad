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
changes; ``tests/test_checkpoint.py`` proves value-equality of both
modes in a dedicated subprocess session (so the shared test session's
mode is untouched) and asserts the reliable branch actually wrote
checkpoint files.

Reliable-mode operational notes (the costs local mode does not have):

- **Double-compute guard.** ``Dataset.checkpoint()`` materializes the
  plan once to run the job and a SECOND time in the separate job that
  writes the checkpoint files — unless the frame is persisted first.
  The reliable branch therefore persists (at ``storage_level``, default
  ``MEMORY_AND_DISK``) before ``checkpoint(eager=True)`` and unpersists
  immediately after the checkpoint files exist, so the plan above the
  truncation point runs exactly once, same as local mode.
- **Eagerness.** The reliable branch always checkpoints eagerly, even
  for ``eager=False`` call sites (the lazy form exists to preserve
  local stage pipelining, which reliable file-writing breaks anyway;
  deferring it would also defeat the persist/unpersist bracket above).
  Values are identical either way.
- **Directory growth.** Reliable checkpoint files are NOT deleted when
  the DataFrame goes out of scope unless
  ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` is set (and
  JVM GC runs). Long loops and streaming jobs should enable it — or
  point the checkpoint dir at storage with a TTL/lifecycle rule.
- **Streaming micro-batches opt out.** ``foreachBatch`` handlers pass
  ``local_only=True``: losing an executor there costs replaying one
  micro-batch (the streaming engine's own WAL/offset checkpointing
  provides recovery), while writing reliable files per micro-batch
  grows the checkpoint dir without bound at exactly the cadence the
  cleaner cannot keep up with.
- **Spark Connect.** Connect sessions expose no ``sparkContext``; the
  probe for a configured checkpoint dir is wrapped so Connect falls
  back to ``localCheckpoint`` (which Connect supports) instead of
  raising on every truncation point.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def _checkpoint_dir(df: DataFrame) -> Optional[str]:
    """The configured reliable checkpoint dir, or None.

    None also when the session has no ``sparkContext`` at all (Spark
    Connect) — there the only available truncation is local.
    """
    try:
        return df.sparkSession.sparkContext.getCheckpointDir()
    except Exception:
        return None


def cut_lineage(
    eager: bool = True,
    storage_level: Optional[StorageLevel] = None,
    local_only: bool = False,
) -> Callable[[DataFrame], DataFrame]:
    """Truncation point: ``df.transform(cut_lineage())``.

    Returns a function suitable for ``DataFrame.transform`` so call
    sites keep their method-chain shape. Reliable
    (``DataFrame.checkpoint``) when the SparkContext has a checkpoint
    directory configured; ``localCheckpoint`` otherwise.

    ``storage_level`` applies to the local block store in local mode
    and to the persist-before-checkpoint bracket in reliable mode (see
    module docstring). ``eager=False`` defers materialization in local
    mode only — the reliable branch is always eager. ``local_only=True``
    pins the call site to ``localCheckpoint`` regardless of
    configuration (streaming micro-batch frames, where reliable files
    per batch are a leak, not a safety upgrade).
    """

    def _apply(df: DataFrame) -> DataFrame:
        if not local_only and _checkpoint_dir(df) is not None:
            # Persist first: Dataset.checkpoint's file-writing job
            # otherwise recomputes the whole plan a second time. But
            # only persist/unpersist a frame THIS call cached: if the
            # caller already persisted it, persist() here is a no-op
            # and the finally would silently drop the caller's cache —
            # releasing storage cut_lineage does not own.
            we_persisted = not df.is_cached
            if we_persisted:
                df.persist(storage_level or StorageLevel.MEMORY_AND_DISK)
            try:
                return df.checkpoint(eager=True)
            finally:
                if we_persisted:
                    df.unpersist()
        if storage_level is not None:
            return df.localCheckpoint(eager=eager, storageLevel=storage_level)
        return df.localCheckpoint(eager=eager)

    return _apply
