"""Push-style streaming source (reference `Stream.add_item()`,
SURVEY.md §2.3 E3 / `IODataStructures.py`).

PySpark exposes no public arbitrary-row in-memory streaming source, so
the reference's push-queue ergonomics are provided over the engine's
micro-batch file feed: ``add_item``/``add_items`` buffer rows on the
driver, ``flush()`` publishes them ATOMICALLY (write to a hidden temp
file + rename — a half-written file is never visible to the reader),
and ``readStream(spark)`` / ``CepEngine.run_stream`` consume the feed
directory like any other source.  ``close()`` publishes a final
watermark-flush row so availableNow runs seal every pending match.

At cluster scale the same call pattern maps onto a real queue (Kafka /
Iceberg commits): the class is the API seam, the directory is the
sandbox transport.
"""

from __future__ import annotations

import os
import threading
import uuid

import pandas as pd

__all__ = ["PushStream"]


class PushStream:
    """In-memory push buffer backed by an atomic micro-batch file feed.

        ps = PushStream("/tmp/feed", schema_like=events_pdf)
        ps.add_item({"user_id": 1, "event_id": 7, "ts": ..., ...})
        ps.flush()                      # one published micro-batch
        sdf = ps.readStream(spark)      # -> streaming DataFrame

    ``auto_flush_rows`` publishes automatically once the buffer reaches
    that many rows (None = only explicit flush()).
    """

    def __init__(self, feed_dir: str, schema_like: pd.DataFrame | None = None,
                 auto_flush_rows: int | None = None):
        self.feed_dir = feed_dir
        self.auto_flush_rows = auto_flush_rows
        self._rows: list[dict] = []
        self._schema_like = schema_like
        self._lock = threading.Lock()
        self._closed = False
        os.makedirs(feed_dir, exist_ok=True)
        # resume after the highest existing batch index: Spark's file
        # source tracks consumed FILENAMES, so overwriting
        # batch-00000000.parquet on a reused feed_dir (driver restart)
        # would silently lose every new row
        existing = [
            int(f[len("batch-") : -len(".parquet")])
            for f in os.listdir(feed_dir)
            if f.startswith("batch-") and f.endswith(".parquet")
        ]
        self._seq = max(existing) + 1 if existing else 0
        if schema_like is not None and not len(os.listdir(feed_dir)):
            # seed an empty file so readStream can infer the schema; an
            # empty pandas frame writes object columns as pyarrow `null`
            # type, so infer the arrow schema from one sample row first
            self._write_seed(schema_like)

    # -- producer side ----------------------------------------------------

    def add_item(self, row: dict) -> None:
        if self._closed:
            raise ValueError("PushStream is closed")
        with self._lock:
            self._rows.append(dict(row))
            if self.auto_flush_rows and len(self._rows) >= self.auto_flush_rows:
                self._flush_locked()

    def add_items(self, rows) -> None:
        """Accepts an iterable of dicts or a pandas DataFrame."""
        if isinstance(rows, pd.DataFrame):
            rows = rows.to_dict("records")
        for r in rows:
            self.add_item(r)

    def flush(self) -> int:
        """Publish the buffered rows as ONE micro-batch file; returns the
        number of rows published."""
        with self._lock:
            return self._flush_locked()

    def close(self, flush_row: dict | None = None) -> None:
        """Final flush; optionally append a far-future watermark-flush
        row (ms-floored watermarks never seal the globally-last event —
        see CLAUDE.md) so availableNow drains everything."""
        with self._lock:
            if flush_row is not None:
                self._rows.append(dict(flush_row))
            self._flush_locked()
            self._closed = True

    def _flush_locked(self) -> int:
        if not self._rows:
            return 0
        pdf = pd.DataFrame(self._rows)
        if self._schema_like is not None:
            pdf = pdf[list(self._schema_like.columns)]
            for c, dt in self._schema_like.dtypes.items():
                pdf[c] = pdf[c].astype(dt)
        n = len(pdf)
        self._write_pdf(pdf)
        self._rows = []
        return n

    def _write_seed(self, schema_like: pd.DataFrame) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not len(schema_like):
            raise ValueError("schema_like needs at least one row to infer types")
        sample = schema_like.iloc[0:1].copy()
        for c in sample.columns:
            if str(sample[c].dtype).startswith("datetime64"):
                sample[c] = sample[c].astype("datetime64[us]")
        schema = pa.Table.from_pandas(sample, preserve_index=False).schema
        tmp = os.path.join(self.feed_dir, f".tmp-{uuid.uuid4().hex}.parquet")
        final = os.path.join(self.feed_dir, f"batch-{self._seq:08d}.parquet")
        pq.write_table(schema.empty_table(), tmp)
        os.rename(tmp, final)
        self._seq += 1

    def _write_pdf(self, pdf: pd.DataFrame) -> None:
        pdf = pdf.copy()
        for c in pdf.columns:  # Spark cannot read TIMESTAMP(NANOS) parquet
            if str(pdf[c].dtype).startswith("datetime64"):
                pdf[c] = pdf[c].astype("datetime64[us]")
        tmp = os.path.join(self.feed_dir, f".tmp-{uuid.uuid4().hex}.parquet")
        final = os.path.join(self.feed_dir, f"batch-{self._seq:08d}.parquet")
        if os.path.exists(final):  # never clobber a published batch
            raise FileExistsError(f"batch file already published: {final}")
        pdf.to_parquet(tmp, index=False)
        os.rename(tmp, final)  # atomic publish: never a torn file
        self._seq += 1

    # -- consumer side ----------------------------------------------------

    def readStream(self, spark, schema=None, max_files_per_trigger: int | None = 1):
        """Streaming DataFrame over the feed (one file ≈ one micro-batch
        with the default maxFilesPerTrigger=1)."""
        reader = spark.readStream
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.schema(spark.read.parquet(self.feed_dir).schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.parquet(self.feed_dir)
