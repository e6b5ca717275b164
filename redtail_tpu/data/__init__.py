"""Dataset tooling: trail-dataset list building and loading (the
DIGITS-list workflow of `models/dataset/idsia_trails_dataset_digits.py`
rebuilt as plain Python + numpy batching)."""

from redtail_tpu.data.trails import (
    TrailsDataset,
    balance_samples,
    build_trail_lists,
)

__all__ = ["build_trail_lists", "balance_samples", "TrailsDataset"]
