"""Orbax-based pytree checkpointing (primary TPU-native format).

Training *is* resume in the reference — ``train`` loads existing CSVs,
updates, saves on exit (model/mnist_nn.c:165-170,371-376). Here the whole
train state (params, optimizer moments, step counter, PRNG key) is one pytree
saved per step; a killed run restores the latest step and continues
(SURVEY.md §5 "Failure detection / checkpoint-resume").

Two layers:
- ``save_pytree``/``restore_pytree``/``latest_step``: one-shot synchronous
  save/restore with optional keep-last-k retention; the no-orbax fallback
  writes atomically (tmp dir + rename) so a crash mid-save never leaves a
  restorable-looking partial step.
- ``TrainCheckpointer``: the production path — orbax CheckpointManager with
  **async** saves (training continues while the previous checkpoint drains to
  disk), max-to-keep retention, and optional best-k selection by a metric
  (e.g. keep the 3 lowest-loss steps).
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False

_STEP_RE = re.compile(r"^step_(\d+)$")


def _step_dir(base_dir: str, step: int) -> Path:
    return Path(base_dir) / f"step_{step}"


def latest_step(base_dir: str) -> Optional[int]:
    base = Path(base_dir)
    if not base.is_dir():
        return None
    steps = []
    for p in base.iterdir():
        m = _STEP_RE.match(p.name)
        # skip partially-written dirs: both orbax and the fallback rename a
        # complete tmp dir into place, so an empty dir is never restorable
        if m and p.is_dir() and any(p.iterdir()):
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def _apply_retention(base_dir: str, keep_last: int) -> None:
    base = Path(base_dir)
    steps = sorted(
        int(m.group(1))
        for p in base.iterdir()
        if (m := _STEP_RE.match(p.name)))
    for s in steps[:-keep_last]:
        shutil.rmtree(_step_dir(base_dir, s), ignore_errors=True)


def save_pytree(base_dir: str, step: int, tree: Any,
                keep_last: Optional[int] = None) -> None:
    """Save a pytree checkpoint at ``base_dir/step_<step>``. With
    ``keep_last=k`` only the k most recent steps are retained (ADVICE r1:
    per-step checkpointing of a sizeable U-Net state must not accumulate
    unbounded disk)."""
    path = _step_dir(base_dir, step)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.resolve(), tree, force=True)
        ckptr.wait_until_finished()
    else:  # pragma: no cover - orbax is baked into the target env
        import os

        tmp = path.with_name(path.name + f".tmp{os.getpid()}")
        tmp.mkdir(parents=True, exist_ok=True)
        flat, treedef = jax.tree.flatten(tree)
        np.savez(tmp / "flat.npz", *[np.asarray(x) for x in flat])
        (tmp / "treedef.txt").write_text(str(treedef))
        if path.exists():
            shutil.rmtree(path)
        tmp.rename(path)  # atomic within a filesystem
    if keep_last is not None and keep_last > 0:
        _apply_retention(base_dir, keep_last)


def restore_pytree(base_dir: str, target: Any,
                   step: Optional[int] = None) -> Any:
    """Restore the pytree at ``step`` (default: latest). ``target`` supplies
    structure/shardings — pass the freshly-initialized state and arrays are
    restored with its shapes/dtypes/placements."""
    if step is None:
        step = latest_step(base_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {base_dir}")
    path = _step_dir(base_dir, step)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path.resolve(), target=target)
    flat, treedef = jax.tree.flatten(target)  # pragma: no cover
    data = np.load(path / "flat.npz")
    restored = [data[k] for k in data.files]
    return jax.tree.unflatten(treedef, restored)


class TrainCheckpointer:
    """Async checkpoint manager with retention / best-k selection.

    - ``max_to_keep``: retain at most k steps (oldest dropped first).
    - ``best_metric``/``best_mode``: when set (e.g. ``"loss"``/``"min"``),
      retention keeps the k *best* steps by that metric instead of the k
      most recent — pass the metric value to ``save(..., metrics={...})``.
    - saves are asynchronous: ``save`` returns as soon as the state is
      snapshotted; serialization overlaps subsequent training steps. Call
      ``wait()``/``close()`` before reading the files (done automatically on
      ``close``).

    Uses the same ``step_<n>`` directory layout as ``save_pytree``, so
    existing checkpoints keep restoring.
    """

    def __init__(self, base_dir: str, max_to_keep: Optional[int] = 3,
                 best_metric: Optional[str] = None, best_mode: str = "min",
                 async_saves: bool = True):
        if not _HAVE_ORBAX:  # pragma: no cover - orbax baked into target env
            raise RuntimeError("TrainCheckpointer requires orbax")
        kwargs = {}
        if best_metric is not None:
            kwargs.update(best_fn=lambda m: m[best_metric],
                          best_mode=best_mode,
                          keep_checkpoints_without_metrics=False)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            step_prefix="step",
            create=True,
            enable_async_checkpointing=async_saves,
            **kwargs)
        self._mngr = ocp.CheckpointManager(
            Path(base_dir).resolve(), options=options)

    def save(self, step: int, tree: Any, metrics: Optional[dict] = None):
        self._mngr.save(step, args=ocp.args.StandardSave(tree),
                        metrics=metrics, force=True)

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        if step is None:
            step = self._mngr.latest_step()
            if step is None:
                raise FileNotFoundError("no checkpoints in manager dir")
        return self._mngr.restore(
            step, args=ocp.args.StandardRestore(target))

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def all_steps(self):
        return sorted(self._mngr.all_steps())

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
