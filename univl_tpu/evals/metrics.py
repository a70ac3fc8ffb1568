"""Retrieval metrics (reference: metrics.py:8-27).

R@K / MedianR / MeanR from the rank of the diagonal of a text x video
similarity matrix. Rank = number of entries in the row strictly greater than
the diagonal entry (first-occurrence semantics of the reference's sorted
lookup, well-defined under ties).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def compute_retrieval_metrics(sim_matrix: np.ndarray) -> Dict[str, float]:
    x = np.asarray(sim_matrix)
    assert x.ndim == 2 and x.shape[0] == x.shape[1], x.shape
    d = np.diagonal(x)
    ranks = (x > d[:, None]).sum(axis=1)  # 0-based rank of the true pair
    return {
        "R1": float((ranks == 0).mean()),
        "R5": float((ranks < 5).mean()),
        "R10": float((ranks < 10).mean()),
        "MR": float(np.median(ranks) + 1),
        "MeanR": float(ranks.mean() + 1),
    }
