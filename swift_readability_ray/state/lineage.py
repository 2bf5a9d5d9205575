"""Per-partition lineage records for resumable runs (SURVEY.md §4.2).

The output layout is one directory per hash partition
(``out/part=<k>/``).  A partition is *complete* iff a lineage record
``lineage/part-<k>.json`` exists; the record is written atomically
(tmp + rename) only after the partition's output files are fully written.
On restart, completed partitions are skipped (anti-filter of the input) and
their half-written orphan directories, if any, are removed before re-run —
no duplicates, no loss.
"""

from __future__ import annotations

import json
import os
import shutil


class LineageLog:
    def __init__(self, output_path: str) -> None:
        self.output_path = output_path
        self.lineage_dir = os.path.join(output_path, "lineage")
        os.makedirs(self.lineage_dir, exist_ok=True)

    def partition_dir(self, part: int) -> str:
        return os.path.join(self.output_path, f"part={part}")

    def completed_partitions(self) -> set[int]:
        done: set[int] = set()
        for name in os.listdir(self.lineage_dir):
            if name.startswith("part-") and name.endswith(".json"):
                try:
                    done.add(int(name[len("part-") : -len(".json")]))
                except ValueError:
                    continue
        return done

    def record(self, part: int, row_count: int, extra: dict | None = None) -> None:
        payload = {"partition_id": part, "row_count": row_count, "status": "complete"}
        if extra:
            payload.update(extra)
        tmp = os.path.join(self.lineage_dir, f".part-{part}.json.tmp")
        final = os.path.join(self.lineage_dir, f"part-{part}.json")
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, final)  # atomic on POSIX

    def clean_orphan(self, part: int) -> None:
        """Remove a half-written partition dir (no lineage record)."""
        d = self.partition_dir(part)
        if os.path.isdir(d):
            shutil.rmtree(d)

    def records(self) -> list[dict]:
        out = []
        for part in sorted(self.completed_partitions()):
            with open(os.path.join(self.lineage_dir, f"part-{part}.json")) as f:
                out.append(json.load(f))
        return out

    def metrics_table(self):
        """Job metrics as a METRICS-schema Arrow table (one row/partition)."""
        import pyarrow as pa

        from ..schema import METRICS

        recs = self.records()
        cols = {
            "stage": ["extract"] * len(recs),
            "partition_id": [r["partition_id"] for r in recs],
            "docs_processed": [r.get("docs_processed", r["row_count"]) for r in recs],
            "docs_failed": [r.get("docs_failed", 0) for r in recs],
            "bytes_parsed": [r.get("bytes_parsed", 0) for r in recs],
            "candidates_scored": [r.get("candidates_scored", 0) for r in recs],
            "wall_seconds": [float(r.get("wall_seconds", 0.0)) for r in recs],
        }
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], type=f.type) for f in METRICS], schema=METRICS
        )
