"""Partition manifest: the checkpoint store for resumable runs.

The reference's resume mechanism is a done-marker file written *before* its
correction pass finishes (``ocr.py:46-47``; marker-ordering bug at
``claude_vision_engine.py:349-368``). Here the unit is an input shard and the
commit protocol is: write the shard's output parquet to a temp path → rename
into place (atomic on one filesystem) → append the manifest line with lineage
metrics. A shard is only considered done if its manifest line exists, and the
manifest line is only written after the output is durable — a crash between
the two re-processes the shard (idempotent: the rename replaces the output).

Each manifest line is also the shard's **lineage record**: rows in/out, span
and error counts, wall time — the Ray-native replacement for the reference's
``detection_info.txt`` + console totals.
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def committed(self) -> dict[str, dict]:
        done: dict[str, dict] = {}
        if not os.path.exists(self.path):
            return done
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                done[rec["shard"]] = rec
        return done

    def commit(self, shard: str, lineage: dict) -> None:
        rec = {"shard": shard, "ts": time.time(), **lineage}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def pending(self, shards: list[str]) -> list[str]:
        done = self.committed()
        return [s for s in shards if s not in done]
