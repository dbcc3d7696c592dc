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

import numpy as np

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

    def _file_to_rows(batch: pa.Table) -> pa.Table:
        # one input row = one WHOLE file (read_binary_files), so line
        # numbers are true per-file offsets — read_text + a per-batch
        # range() restarted turn_idx every batch and silently corrupted
        # the file's ordering for any file longer than one batch
        out_conv, out_idx, out_text = [], [], []
        for p, data in zip(batch["path"].to_pylist(),
                           batch["bytes"].to_pylist()):
            lines = data.decode("utf-8", "replace").splitlines()
            conv = name if source_name else os.path.basename(p)
            out_conv += [conv] * len(lines)
            out_idx.append(np.arange(len(lines), dtype=np.int32))
            out_text += lines
        n = len(out_text)
        idx = (np.concatenate(out_idx) if out_idx
               else np.array([], np.int32))
        return pa.table({
            "conv_id": pa.array(out_conv, pa.string()),
            "turn_idx": pa.array(idx, pa.int32()),
            "role": pa.array(out_conv, pa.string()),
            "text": pa.array(out_text, pa.string()),
            "tool": pa.array(["none"] * n, pa.string()),
            "ts": pa.array([0] * n, pa.timestamp("us")),
        })

    return ray.data.read_binary_files(path, include_paths=True) \
        .map_batches(_file_to_rows, batch_format="pyarrow")
