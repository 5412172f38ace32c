"""Device compute kernels (the reference's ★ hot loops re-designed for TPU).

- ``kernels``: jitted XLA kernels — predicate masks, projection arithmetic,
  exact sort-based group aggregation, distinct, sort/take.
- ``pallas_agg``: Pallas fused filter+aggregate kernels for the dense
  dictionary-code fast path (the bench hot loop).
"""

from . import kernels  # noqa: F401
