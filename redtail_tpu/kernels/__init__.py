"""Pallas TPU kernels for the custom ops.

The reference hand-wrote CUDA for exactly these ops
(`stereoDNN/lib/kernels.cu`); everything else rides XLA.

Status: the correlation/concat cost-volume kernels are implemented,
correctness-tested (interpret mode on CPU + against the XLA ops), and
carry custom VJPs — but they are **opt-in**
(`REDTAIL_TPU_PALLAS_CV=1`) rather than the default inference path:

- In this build environment Mosaic kernels compile through a remote
  compile service at ~10 minutes per kernel, which dwarfs any runtime
  win for a 0.2-4 ms op and destabilizes benchmarking.
- The XLA gather formulation of the cost volume, combined with the
  disparity-friendly layouts in `models/stereo.py`, already exceeds the
  BASELINE.md performance target (>200 fps ResNet18-2D @ 1025x321).

Design notes that survive in the kernels (hard-won on a v5e): shift along
the **sublane** axis (lane-axis `tpu.dynamic_rotate` costs ~14 us per
call at (32,8,513)); never require a dynamic index on the last two block
dims; keep loops as `fori_loop` (a 48-way Python unroll explodes Mosaic
compile time); emit layouts the consumer wants so no transpose
materializes on either side of the `pallas_call`.
"""

from redtail_tpu.kernels.cost_volume_pallas import (
    corr_cost_volume_pallas,
    cost_volume_pallas,
)

__all__ = ["corr_cost_volume_pallas", "cost_volume_pallas"]
