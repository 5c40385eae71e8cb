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


def test_save_pytree_keep_last(tmp_path, rng):
    tree = {"w": jnp.asarray(rng.standard_normal((3, 2)), jnp.float32)}
    for s in (1, 2, 3, 4):
        save_pytree(str(tmp_path), s, tree, keep_last=2)
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["step_3", "step_4"]
    assert latest_step(str(tmp_path)) == 4


def test_latest_step_skips_empty_partial_dir(tmp_path, rng):
    tree = {"w": jnp.asarray(rng.standard_normal((3, 2)), jnp.float32)}
    save_pytree(str(tmp_path), 5, tree)
    (tmp_path / "step_9").mkdir()  # crash left an empty dir
    assert latest_step(str(tmp_path)) == 5


def test_train_checkpointer_async_retention_restore(tmp_path, rng):
    from big_linear_algebra_tpu.ckpt.pytree import TrainCheckpointer

    tree = {"w": jnp.asarray(rng.standard_normal((4, 4)), jnp.float32),
            "step": jnp.asarray(0)}
    with TrainCheckpointer(str(tmp_path), max_to_keep=2) as ck:
        for s, loss in [(1, 5.0), (2, 3.0), (3, 4.0)]:
            ck.save(s, dict(tree, step=jnp.asarray(s)),
                    metrics={"loss": loss})
        ck.wait()
        assert ck.all_steps() == [2, 3]      # keep-last-2
        restored = ck.restore(tree)
        assert int(restored["step"]) == 3
        np.testing.assert_allclose(np.asarray(restored["w"]),
                                   np.asarray(tree["w"]))


def test_train_checkpointer_best_k(tmp_path, rng):
    from big_linear_algebra_tpu.ckpt.pytree import TrainCheckpointer

    tree = {"w": jnp.zeros((2, 2), jnp.float32)}
    with TrainCheckpointer(str(tmp_path), max_to_keep=2,
                           best_metric="loss") as ck:
        for s, loss in [(1, 2.0), (2, 9.0), (3, 1.0), (4, 8.0)]:
            ck.save(s, tree, metrics={"loss": loss})
        ck.wait()
        # keeps the two LOWEST-loss steps, not the two most recent
        assert ck.all_steps() == [1, 3]
