"""Checkpoint tests: CSV layouts + orbax pytree save/restore/resume."""

import jax.numpy as jnp
import numpy as np
import pytest

from big_linear_algebra_tpu.ckpt import (
    latest_step,
    load_matrices,
    restore_pytree,
    save_matrices,
    save_pytree,
)
from big_linear_algebra_tpu.ckpt.csv_layouts import layout_exists


def test_csv_layout_roundtrip(tmp_path, rng):
    arrays = {
        "weights_1.csv": rng.standard_normal((8, 4)).astype(np.float32),
        "sub/biases_1.csv": rng.standard_normal((8, 1)).astype(np.float32),
    }
    spec = {k: v.shape for k, v in arrays.items()}
    assert not layout_exists(str(tmp_path), spec)
    save_matrices(str(tmp_path), arrays)
    assert layout_exists(str(tmp_path), spec)
    back = load_matrices(str(tmp_path), spec)
    for k in arrays:
        np.testing.assert_allclose(back[k], arrays[k], atol=5e-7)


def test_pytree_save_restore_latest(tmp_path, rng):
    tree = {
        "params": {"w": jnp.asarray(rng.standard_normal((4, 3)), jnp.float32),
                   "b": jnp.zeros((3,), jnp.float32)},
        "step": jnp.asarray(7),
    }
    base = str(tmp_path / "ckpt")
    assert latest_step(base) is None
    save_pytree(base, 7, tree)
    tree2 = {
        "params": {"w": tree["params"]["w"] + 1, "b": tree["params"]["b"]},
        "step": jnp.asarray(13),
    }
    save_pytree(base, 13, tree2)
    assert latest_step(base) == 13

    restored = restore_pytree(
        base,
        target={"params": {"w": jnp.zeros((4, 3), jnp.float32),
                           "b": jnp.zeros((3,), jnp.float32)},
                "step": jnp.asarray(0)},
    )
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]), np.asarray(tree2["params"]["w"])
    )
    assert int(restored["step"]) == 13

    older = restore_pytree(
        base,
        target={"params": {"w": jnp.zeros((4, 3), jnp.float32),
                           "b": jnp.zeros((3,), jnp.float32)},
                "step": jnp.asarray(0)},
        step=7,
    )
    assert int(older["step"]) == 7
