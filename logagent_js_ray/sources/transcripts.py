"""Sources — rebuild of logagent-js input plugins that matter for a batch
engine (SURVEY.md §2.2).

The one real source is the Parquet transcript table
(``BASELINE.json.input_hint``); ``read_lines`` covers raw-line fixtures
(the stdin/files plugins' payload,
/root/reference/lib/plugins/input/files.js, stdin.js) by normalizing a
text file into the same transcript shape so every downstream stage is
source-agnostic — the analogue of logagent's single ``data.raw`` topic.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa

import ray.data

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def list_fragments(path: str | list[str]) -> list[str]:
    """Stable-ordered parquet fragment list — the unit of checkpointing
    (state/manifest.py), the analogue of logagent's per-file tail
    pointers (/root/reference/lib/plugins/input/files.js:210-255)."""
    if isinstance(path, (list, tuple)):
        return sorted(path)
    if os.path.isfile(path):
        return [path]
    frags = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not frags:
        raise FileNotFoundError(f"no parquet fragments under {path}")
    return frags


def read_transcripts(path: str | list[str],
                     columns: list[str] | None = None,
                     **kwargs) -> "ray.data.Dataset":
    """read_parquet with column pruning at the read (only the columns a
    pipeline declares leave storage)."""
    paths = list_fragments(path) if isinstance(path, str) else list(path)
    return ray.data.read_parquet(paths, columns=columns, **kwargs)


def read_lines(path: str, source_name: str | None = None) -> "ray.data.Dataset":
    """Raw text lines -> transcript-shaped rows: one synthetic conversation
    per file, ``turn_idx`` = line number, ``role`` = the file's source name
    (logagent's ``context.sourceName``), fixed ``ts`` base so runs are
    deterministic."""
    name = source_name or os.path.basename(path)

    def _to_rows(batch: dict) -> pa.Table:
        texts = list(batch["text"])
        n = len(texts)
        return pa.table({
            "conv_id": pa.array([name] * n, pa.string()),
            "turn_idx": pa.array(range(n), pa.int32()),
            "role": pa.array([name] * n, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(["none"] * n, pa.string()),
            "ts": pa.array([0] * n, pa.timestamp("us")),
        })

    return ray.data.read_text(path).map_batches(_to_rows)
