"""Checkpoint / resume — a subsystem the reference lacks entirely
(SURVEY.md §5: single final ``.embd`` write, no resume path).

A checkpoint is one ``.npz``: the full padded embedding, the iteration
count, and enough config to sanity-check a resume.  Writes are atomic
(temp file + rename) so a kill mid-write can't corrupt the latest
checkpoint.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional, Tuple

import numpy as np


def save_checkpoint(path: str, emb: np.ndarray, iteration: int, meta: dict = None) -> None:
    """Atomically write embedding + iteration (+ metadata) to ``path``."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, emb=np.asarray(emb), iteration=iteration, **(meta or {}))
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str) -> Tuple[np.ndarray, int]:
    """Return (embedding, iteration)."""
    with np.load(path) as z:
        return z["emb"], int(z["iteration"])


def train_with_checkpoints(
    fv,
    iters: int,
    seed: int = 1,
    x0: Optional[np.ndarray] = None,
    start_iter: int = 0,
    every: int = 100,
    ckpt_dir: str = ".",
    keep: int = 3,
    verbose: bool = False,
) -> np.ndarray:
    """Train in ``every``-iteration spans, checkpointing after each span.

    The RNG stream is keyed by absolute iteration (jax.random.fold_in in
    the train fn), so a resumed run continues the same sample sequence a
    straight run would have drawn.
    """
    import jax

    x = fv.pad_embedding(x0) if x0 is not None else fv.init_embedding(seed)
    key = jax.random.PRNGKey(seed)
    done = start_iter
    paths = []
    while done < iters:
        k = min(every, iters - done)
        x = fv._train_jit(fv._garr, x, key, k, done)
        done += k
        emb_host = np.asarray(x)
        path = os.path.join(ckpt_dir, f"ckpt_{done:07d}.npz")
        save_checkpoint(path, emb_host, done, {"seed": seed, "dim": fv.config.dim})
        paths.append(path)
        if len(paths) > keep:
            old = paths.pop(0)
            if os.path.exists(old):
                os.unlink(old)
        if verbose:
            print(f"checkpoint @ iter {done} -> {path}")
    return np.asarray(x[: fv.graph.n])
