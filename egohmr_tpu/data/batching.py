"""Batch-shape utilities shared by the train/eval CLIs.

One odd-shaped final batch would force a full recompile of the jitted
pipeline (15-30 min through the remote TPU compiler), so short batches are
padded to the compiled shape and their rows excluded from metrics by the
caller via the returned valid count.
"""
from __future__ import annotations

import numpy as np


def pad_batch(b, target: int):
    """Pad a short batch to `target` rows by repeating the last item.

    Works on nested dict/list/array pytrees (leading axis = batch). The
    caller is responsible for weighting padded rows out of any metric.
    """

    def pad(x):
        if isinstance(x, dict):
            return {k: pad(v) for k, v in x.items()}
        if isinstance(x, list):
            return x + [x[-1]] * (target - len(x))
        pad_n = target - x.shape[0]
        return np.concatenate([x, np.repeat(x[-1:], pad_n, axis=0)])

    return pad(b)
