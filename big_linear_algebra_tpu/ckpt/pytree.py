"""Orbax-based pytree checkpointing (primary TPU-native format).

Training *is* resume in the reference — ``train`` loads existing CSVs,
updates, saves on exit (model/mnist_nn.c:165-170,371-376). Here the whole
train state (params, optimizer moments, step counter, PRNG key) is one pytree
saved per step; a killed run restores the latest step and continues
(SURVEY.md §5 "Failure detection / checkpoint-resume").
"""

from __future__ import annotations

import re
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
    steps = [
        int(m.group(1))
        for p in base.iterdir()
        if (m := _STEP_RE.match(p.name))
    ]
    return max(steps) if steps else None


def save_pytree(base_dir: str, step: int, tree: Any) -> None:
    """Save a pytree checkpoint at ``base_dir/step_<step>``."""
    path = _step_dir(base_dir, step)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.resolve(), tree, force=True)
        ckptr.wait_until_finished()
    else:  # pragma: no cover - orbax is baked into the target env
        path.mkdir(parents=True, exist_ok=True)
        flat, treedef = jax.tree.flatten(tree)
        np.savez(path / "flat.npz", *[np.asarray(x) for x in flat])
        (path / "treedef.txt").write_text(str(treedef))


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
