"""Match sinks: pluggable destinations for accumulated point matches.

The reference's only in-process transport is a libcurl HTTP PUT to the
Janelia Render service (src/optflow.cpp:595-641), with the file-system TIFF
maps as the de-facto offline checkpoint (SURVEY.md §5). Here the sink is an
interface: an HTTP render-ws client (sinks/http.py), a local JSONL store
(replayable, idempotent-append), or a null sink.
"""

from __future__ import annotations

import json
import os
from typing import List, Protocol


class MatchSink(Protocol):
    def put(self, matches: List[dict]) -> bool:
        """Deliver a batch of Render-schema match dicts. Returns success."""
        ...


class NullMatchSink:
    """Discard matches (useful for benchmarking the solve path)."""

    def __init__(self):
        self.count = 0

    def put(self, matches: List[dict]) -> bool:
        self.count += len(matches)
        return True


class JsonlMatchSink:
    """Append match batches to a local JSONL file — the durable,
    replayable equivalent of the reference's HTTP-or-lost delivery
    (curl failure drops the batch, src/optflow.cpp:635-638; here nothing
    is dropped and uploads can be replayed later by tools/upload_matches)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def put(self, matches: List[dict]) -> bool:
        with open(self.path, "a") as f:
            for m in matches:
                f.write(json.dumps(m) + "\n")
        return True

    def read_all(self) -> List[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
