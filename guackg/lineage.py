"""Per-stage / per-partition lineage + counters → resumable pipeline.

Reimagines the reference's at-least-once story: NATS durable consumers
re-deliver unacked documents and idempotent natural-key upserts make
replays harmless (/root/reference/pkg/emitter/nats_emitter.go:31-42,
pkg/assembler/backends/inmem/pkg.go:344-434). Batch translation:

- every stage output is a PURE function of its input table + stage
  version, written atomically (guackg.io.write_table);
- `_lineage` records (stage, fingerprint, partitions, rows, status);
- on re-run, a stage whose fingerprint matches a COMPLETED record is
  skipped and its output re-read — so a killed pipeline resumes
  mid-flight and produces byte-identical finals (FIXTURES.md §7);
- `_counters` records per-stage per-partition row counts (the
  observability analog of guac's ingest stats, ingestor.go:67-69).

Lineage records are tiny JSON files (one per stage) — on a real
cluster they'd live in an Iceberg `_lineage` table keyed by
(stage, partition); the JSON keeps the sandbox dependency-free while
preserving the protocol.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Lineage:
    def __init__(self, workdir: str) -> None:
        self.dir = os.path.join(workdir, "_lineage")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.dir, f"{stage}.json")

    def completed(self, stage: str, fingerprint: str) -> bool:
        p = self._path(stage)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            rec = json.load(f)
        return rec.get("status") == "complete" and \
            rec.get("fingerprint") == fingerprint

    def record(self, stage: str, fingerprint: str, df: DataFrame,
               table_path: str | None = None) -> dict:
        """Write per-partition counters + the completion record.
        Called AFTER the stage output is durably written.

        When the stage output is a parquet table, per-partition row
        counts come from the parquet FOOTERS (driver-side metadata
        read, no Spark job) — the Iceberg analog is the manifest's
        per-file record counts. Falls back to a Spark aggregation for
        non-tabular outputs."""
        parts: list[dict]
        if table_path and os.path.isdir(table_path):
            import pyarrow.parquet as pq

            def _data_files(root):
                # match Spark's file-index view: '_'/'.'-prefixed dirs
                # are invisible (io.py's crash-recovery helpers —
                # _mswap_old_*, _compact_old_* — park moved-aside row
                # copies there; a swallowed cleanup would otherwise
                # DOUBLE-COUNT those rows, and total_rows feeds real
                # decisions, e.g. the pipeline's broadcast budget)
                for r, dirs, fs in os.walk(root):
                    dirs[:] = [d for d in dirs
                               if not d.startswith(("_", "."))]
                    for fn in fs:
                        if fn.endswith(".parquet"):
                            yield os.path.join(r, fn)

            files = sorted(_data_files(table_path))
            parts = [{"partition_id": i,
                      "rows": pq.read_metadata(f).num_rows}
                     for i, f in enumerate(files)]
        else:
            rows = (df.groupBy(F.spark_partition_id().alias("partition_id"))
                    .agg(F.count("*").alias("rows")).collect())
            parts = sorted(
                [{"partition_id": int(r["partition_id"]),
                  "rows": int(r["rows"])} for r in rows],
                key=lambda d: d["partition_id"])
        rec = {
            "stage": stage,
            "fingerprint": fingerprint,
            "status": "complete",
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "partitions": parts,
            "total_rows": int(sum(p["rows"] for p in parts)),
        }
        tmp = self._path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1)
        os.replace(tmp, self._path(stage))
        return rec

    def read(self, stage: str) -> dict | None:
        p = self._path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)
