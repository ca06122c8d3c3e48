"""Training previews + structured metrics (SURVEY.md §5 'Metrics / logging').

The reference dumps PNG slice previews and TensorBoard scalars every
``outputInterval``; here: a [input | generated | target] patch grid PNG, a
metrics CSV/JSONL appender, and TensorBoard event files in ``<run>/tb/`` so
``tensorboard --logdir`` works exactly as with the reference's tf.summary
output. Event writing needs a SummaryWriter implementation: torch's
(torch.utils.tensorboard) or tensorboardX's — the bare ``tensorboard``
package ships only the reader/web UI. Without either, TB mirroring silently
disables; CSV/JSONL always work.
"""

from __future__ import annotations

import csv
import json
import os

import numpy as np


def norm_u8(img: np.ndarray, peak: float | None = None) -> np.ndarray:
    """Normalize a float image to uint8 — the one grayscale-scaling
    implementation (preview grids, volume slices, inference PNGs)."""
    # `is None`, not falsy: an explicit peak of 0.0 (all-zero preview batch,
    # common early in training) must keep the SHARED scale — falling back to
    # per-image maxima would render tiny noise as full brightness and break
    # cross-column comparability
    if peak is None:
        peak = float(img.max())
    return np.clip(img * 255.0 / max(peak, 1e-6), 0, 255).astype(np.uint8)


_norm = norm_u8  # internal alias


def save_patch_grid(path: str, columns: list[np.ndarray],
                    max_rows: int = 4) -> None:
    """Save a grid PNG: one column per array (B, H, W, 1), one row per batch
    element (first ``max_rows``). Columns are up-scaled (nearest) to the
    tallest column's resolution so LR inputs are visually comparable."""
    from PIL import Image

    cols = [np.asarray(c)[..., 0] for c in columns]
    n = min(max_rows, min(c.shape[0] for c in cols))
    hmax = max(c.shape[1] for c in cols)
    peak = max(float(c.max()) for c in cols)

    tiles = []
    for i in range(n):
        row = []
        for c in cols:
            img = c[i]
            fh, fw = hmax // img.shape[0], hmax // img.shape[1]
            if fh > 1 or fw > 1:
                img = np.repeat(np.repeat(img, max(fh, 1), 0), max(fw, 1), 1)
            row.append(_norm(img[::-1], peak))  # y-up
        tiles.append(np.concatenate(row, axis=1))
    grid = np.concatenate(tiles, axis=0)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path)


def save_volume_slices(path: str, vol: np.ndarray, axis: int = 2) -> None:
    """Mid-slice preview of a (Z, Y, X, 1) volume along ``axis``."""
    from PIL import Image
    v = np.asarray(vol)[..., 0]
    sl = np.take(v, v.shape[axis] // 2, axis=axis)
    Image.fromarray(_norm(sl[::-1])).save(path)


class MetricsWriter:
    """Appends rows to metrics.csv + metrics.jsonl in a run dir, and mirrors
    scalar metrics to TensorBoard events (optional; skipped without the
    tensorboard package). The ``it`` field is the TB step."""

    def __init__(self, run_dir: str, tensorboard: bool = True):
        self.csv_path = os.path.join(run_dir, "metrics.csv")
        self.jsonl_path = os.path.join(run_dir, "metrics.jsonl")
        self._fields: list[str] | None = None
        self._tb = None
        if tensorboard:
            SummaryWriter = None
            try:
                from torch.utils.tensorboard import SummaryWriter
            except Exception:
                try:
                    from tensorboardX import SummaryWriter
                except Exception:
                    SummaryWriter = None
            if SummaryWriter is not None:
                try:
                    self._tb = SummaryWriter(os.path.join(run_dir, "tb"))
                except Exception:
                    self._tb = None

    def write(self, row: dict) -> None:
        if self._tb is not None:
            step = int(row.get("it", 0))
            for k, v in row.items():
                if k != "it" and isinstance(v, (int, float)):
                    self._tb.add_scalar(k, float(v), global_step=step)
            self._tb.flush()
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self._fields is None:
            self._fields = sorted(row.keys())
            new = not os.path.exists(self.csv_path)
            with open(self.csv_path, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._fields,
                                   extrasaction="ignore")
                if new:
                    w.writeheader()
                w.writerow(row)
        else:
            with open(self.csv_path, "a", newline="") as f:
                csv.DictWriter(f, fieldnames=self._fields,
                               extrasaction="ignore").writerow(row)
