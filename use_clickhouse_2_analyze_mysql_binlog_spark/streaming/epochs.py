"""Epoch-replay protection for foreachBatch sinks.

Structured Streaming guarantees each epoch's ``foreachBatch`` body runs *at
least* once: after a crash between the sink write and the checkpoint commit,
the whole micro-batch replays with the same ``epoch_id``. A sink that blindly
appends therefore double-writes under replay. The native file sink solves
this with its ``_spark_metadata`` transaction log; these helpers give
foreachBatch sinks the same property:

- **committed-epoch markers** (``<sink>/_epochs/<id>``): the batch body
  checks the marker first and skips an already-applied epoch. The marker is
  created atomically (tmp + rename) *after* the data write.
- **snapshot manifest** (``<root>/_MANIFEST.json``): snapshot-publishing
  sinks write each epoch's output to a versioned directory and then flip the
  manifest atomically — a crash mid-write leaves the previous snapshot
  intact and readable, and the replay simply rewrites the orphan directory.

Underscore-prefixed paths are ignored by Spark's file-listing, so markers
and manifests never pollute parquet reads of the sink directory.

These helpers use driver-local filesystem atomics (``os.replace``); on a
real cluster the sink root lives on a shared filesystem reachable from the
driver (foreachBatch bodies run driver-side), or is replaced outright by a
transactional table format (Delta/Iceberg ``txnAppId``/``txnVersion``),
which is the recommended production sink at 100 TB.
"""

from __future__ import annotations

import json
import os
import shutil


def epoch_committed(sink_path: str, epoch_id: int) -> bool:
    """True iff ``mark_epoch_committed(sink_path, epoch_id)`` already ran."""
    return os.path.exists(os.path.join(sink_path, "_epochs", str(epoch_id)))


def mark_epoch_committed(sink_path: str, epoch_id: int) -> None:
    """Atomically record that this epoch's writes reached the sink."""
    d = os.path.join(sink_path, "_epochs")
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{epoch_id}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write("")
    os.replace(tmp, os.path.join(d, str(epoch_id)))


def _manifest_path(root: str) -> str:
    return os.path.join(root, "_MANIFEST.json")


def read_manifest(root: str) -> dict | None:
    """Latest published snapshot: ``{"epoch": int, "dir": str}`` or None."""
    try:
        with open(_manifest_path(root), encoding="utf-8") as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def publish_snapshot(root: str, epoch_id: int, snapshot_dir: str) -> None:
    """Atomically flip the manifest to a fully-written snapshot directory,
    then garbage-collect snapshots other than the new and previous one
    (the previous stays readable for in-flight readers)."""
    prev = read_manifest(root)
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"epoch": epoch_id, "dir": snapshot_dir}, fh)
    os.replace(tmp, _manifest_path(root))
    keep = {os.path.basename(snapshot_dir)}
    if prev is not None:
        keep.add(os.path.basename(prev["dir"]))
    snaps = os.path.join(root, "snapshots")
    if os.path.isdir(snaps):
        for name in os.listdir(snaps):
            if name not in keep:
                shutil.rmtree(os.path.join(snaps, name), ignore_errors=True)
