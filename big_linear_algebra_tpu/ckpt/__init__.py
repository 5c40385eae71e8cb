"""Checkpointing: pytree checkpoints + reference-compatible CSV layouts.

The reference's checkpoint format *is* CSV (lib/csv.c writers; per-model
layouts in SURVEY.md §5 "Checkpoint / resume"). We keep that as a
bit-compatible interchange layer (so the shipped trained weights load for
parity tests and our checkpoints load in the reference), and add an
Orbax-based pytree checkpoint as the primary TPU-native format (async-capable,
sharding-aware, restores distributed arrays in place).
"""

from big_linear_algebra_tpu.ckpt.csv_layouts import (  # noqa: F401
    load_matrices,
    save_matrices,
)
from big_linear_algebra_tpu.ckpt.pytree import (  # noqa: F401
    latest_step,
    restore_pytree,
    save_pytree,
)
