"""Reliable vs local lineage truncation (``checkpoint.cut_lineage``).

The reliable branch only runs when a checkpoint directory is configured
on the SparkContext — a JVM-level, session-wide switch the shared test
session must not flip (every other test would silently start writing
checkpoint files). So the reliable leg runs in a SUBPROCESS with its own
session and checkpoint dir, prints its results as JSON, and the parent
test compares them against the same operator run in the shared
(local-mode) session. This is the test the module docstring promises:

- value equality of both modes on a representative truncated pipeline
  (``simhash_near_duplicates`` — fingerprint materialization routes
  through ``cut_lineage``);
- the reliable branch actually wrote checkpoint files (i.e. the branch
  was TAKEN, not silently skipped);
- ``local_only=True`` writes no files even with a dir configured (the
  streaming micro-batch opt-out);
- ``eager=False`` / ``storage_level`` call-site shapes work in reliable
  mode (forced-eager, persist-bracketed) and leave nothing persisted.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from clinical_trials_data_pipeline_analyis_spark.operators.dedup import (
    simhash,
    simhash_near_duplicates,
)

from conftest import SF_DIR

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RELIABLE_SCRIPT = r"""
import json, os, sys
from pyspark.storagelevel import StorageLevel
from clinical_trials_data_pipeline_analyis_spark.session import get_spark
from clinical_trials_data_pipeline_analyis_spark.checkpoint import cut_lineage
from clinical_trials_data_pipeline_analyis_spark.operators.dedup import (
    simhash,
    simhash_near_duplicates,
)

sf_dir, ckpt = sys.argv[1], sys.argv[2]
spark = get_spark(app_name="ckpt-reliable", master="local[4]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.setCheckpointDir(ckpt)

docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
out = simhash_near_duplicates(simhash(docs, "doc_id", "text"), "doc_id")
rows = sorted([int(r[0]), int(r[1]), int(r[2])] for r in out.collect())

def n_files():
    return sum(len(fs) for _, _, fs in os.walk(ckpt))

wrote = n_files()

# eager=False / storage_level call-site shapes (graph/lm/importance,
# RHP) must work in reliable mode and leave nothing persisted behind.
small = docs.limit(20).select("doc_id")
a = sorted(r[0] for r in small.transform(cut_lineage(eager=False)).collect())
b = sorted(
    r[0]
    for r in small.transform(
        cut_lineage(storage_level=StorageLevel.MEMORY_AND_DISK)
    ).collect()
)
leaked = len(spark.sparkContext._jsc.getPersistentRDDs())

# local_only must NOT write files even with a dir configured.
before = n_files()
small.transform(cut_lineage(local_only=True)).count()
local_only_new = n_files() - before

# Ownership (ADVICE r10): a frame the CALLER persisted must still be
# cached after the reliable bracket — cut_lineage only unpersists what
# it persisted itself.
owned = docs.limit(10).select("doc_id")
owned.persist()
owned.count()
owned.transform(cut_lineage()).count()
caller_cache_kept = bool(owned.is_cached)
owned.unpersist()

print(
    "RESULT::"
    + json.dumps(
        {
            "rows": rows,
            "wrote_files": wrote,
            "lazy_ids": a,
            "level_ids": b,
            "persisted_after": leaked,
            "local_only_new_files": local_only_new,
            "caller_cache_kept": caller_cache_kept,
        }
    )
)
"""


def test_reliable_checkpoint_mode_matches_local(spark, tmp_path):
    """Both cut_lineage modes produce identical values; the reliable
    branch writes real checkpoint files and the local_only opt-out
    writes none."""
    ckpt = str(tmp_path / "ckpt")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _RELIABLE_SCRIPT, SF_DIR, ckpt],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO_ROOT,
    )
    assert proc.returncode == 0, f"reliable-mode subprocess failed:\n{proc.stderr[-4000:]}"
    payload = [l for l in proc.stdout.splitlines() if l.startswith("RESULT::")]
    assert payload, f"no RESULT line in subprocess output:\n{proc.stdout[-2000:]}"
    got = json.loads(payload[-1].removeprefix("RESULT::"))

    # The reliable branch was actually taken: files exist under the dir.
    assert got["wrote_files"] > 0, "no checkpoint files written — reliable branch not taken"
    assert got["local_only_new_files"] == 0, "local_only wrote reliable files"
    assert got["persisted_after"] == 0, "persist-before-checkpoint bracket leaked an RDD"
    assert got["caller_cache_kept"], (
        "cut_lineage unpersisted a frame the caller had cached — "
        "it must only release storage it persisted itself"
    )

    # Local-mode leg in the shared session (no checkpoint dir configured).
    assert spark.sparkContext.getCheckpointDir() is None
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = simhash_near_duplicates(simhash(docs, "doc_id", "text"), "doc_id")
    local_rows = sorted([int(r[0]), int(r[1]), int(r[2])] for r in out.collect())

    assert got["rows"] == local_rows
    small = sorted(
        r[0] for r in docs.limit(20).select("doc_id").collect()
    )
    assert got["lazy_ids"] == small
    assert got["level_ids"] == small


def test_connect_mode_falls_back_to_local_checkpoint():
    """Spark Connect exposes no ``sparkContext`` — the checkpoint-dir
    probe must swallow that and route to ``localCheckpoint`` instead of
    raising at every truncation point. Pure-Python fakes: the branch
    under test is driver-side control flow, no cluster needed."""
    from pyspark.storagelevel import StorageLevel

    from clinical_trials_data_pipeline_analyis_spark.checkpoint import cut_lineage

    class _ConnectSession:
        @property
        def sparkContext(self):
            raise NotImplementedError(
                "sparkContext is not supported in Spark Connect"
            )

    class _ConnectDF:
        sparkSession = _ConnectSession()

        def __init__(self):
            self.local_calls = []

        def localCheckpoint(self, eager=True, storageLevel=None):
            self.local_calls.append((eager, storageLevel))
            return self

        def checkpoint(self, eager=True):  # pragma: no cover - guard
            raise AssertionError(
                "reliable branch taken on a Connect-style session"
            )

    df = _ConnectDF()
    assert cut_lineage()(df) is df
    assert df.local_calls == [(True, None)]

    df2 = _ConnectDF()
    level = StorageLevel.MEMORY_AND_DISK
    cut_lineage(eager=False, storage_level=level)(df2)
    assert df2.local_calls == [(False, level)]
