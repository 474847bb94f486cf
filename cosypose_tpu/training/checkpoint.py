"""Checkpoint save/restore (orbax) with the reference's run-directory layout.

Capability match for the reference's checkpointing (ref: train_pose.py:54-61 —
single-file state_dict+epoch per epoch, rank-0 only, config YAML alongside;
resume via --resume run_id, ref: :191-195,260-267). Improvements over the
reference (SURVEY.md §5.4 notes it drops optimizer state): the FULL train state
(params, batch stats, optimizer state, step) is checkpointed, so resume is
exact.

Layout:  <EXP_DIR>/<run_id>/config.yaml
         <EXP_DIR>/<run_id>/checkpoint/<step>/...   (orbax)
         <EXP_DIR>/<run_id>/log.txt                 (jsonlines, see logs.py)
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any

import jax
import numpy as np


def _to_pytree_of_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(run_dir, state, epoch: int, keep: int = 2):
    """Write params/batch_stats/opt_state/step under run_dir/checkpoint."""
    import orbax.checkpoint as ocp

    run_dir = pathlib.Path(run_dir)
    ckpt_dir = run_dir / "checkpoint"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    payload = dict(
        params=_to_pytree_of_numpy(state.params),
        batch_stats=_to_pytree_of_numpy(state.batch_stats),
        opt_state=_to_pytree_of_numpy(state.opt_state),
        step=int(state.step),
        epoch=epoch,
    )
    path = ckpt_dir / f"epoch_{epoch:05d}"
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path.resolve(), payload, force=True)
    # prune old checkpoints
    all_ckpts = sorted(ckpt_dir.glob("epoch_*"))
    for old in all_ckpts[:-keep]:
        import shutil

        shutil.rmtree(old, ignore_errors=True)
    return path


def latest_checkpoint(run_dir):
    ckpt_dir = pathlib.Path(run_dir) / "checkpoint"
    if not ckpt_dir.exists():
        return None
    ckpts = sorted(ckpt_dir.glob("epoch_*"))
    return ckpts[-1] if ckpts else None


def load_checkpoint(path):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(pathlib.Path(path).resolve())


def restore_into_state(state, payload):
    """Rebuild a TrainState from a restored payload (shapes must match).

    Orbax restores containers as plain dicts/lists; re-impose each template's
    pytree structure (optax states are NamedTuples) by unflattening the
    restored leaves into the template treedef.
    """
    import jax.numpy as jnp

    def like(template, value):
        leaves = jax.tree.leaves(value)
        treedef = jax.tree.structure(template)
        t_leaves = jax.tree.leaves(template)
        assert len(leaves) == len(t_leaves), (len(leaves), len(t_leaves))
        leaves = [
            jnp.asarray(v, getattr(t, "dtype", None))
            for t, v in zip(t_leaves, leaves)
        ]
        return jax.tree.unflatten(treedef, leaves)

    return state.replace(
        params=like(state.params, payload["params"]),
        batch_stats=like(state.batch_stats, payload["batch_stats"]),
        opt_state=like(state.opt_state, payload["opt_state"]),
        step=jnp.asarray(payload["step"], jnp.int32),
    )


def save_config(run_dir, cfg: Any):
    """YAML-ish dump of a (nested) dataclass config (ref: train_pose.py:51-52)."""
    run_dir = pathlib.Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)

    def encode(o):
        if dataclasses.is_dataclass(o):
            return {f.name: encode(getattr(o, f.name))
                    for f in dataclasses.fields(o)}
        if isinstance(o, (list, tuple)):
            return [encode(v) for v in o]
        if isinstance(o, type):
            return o.__name__
        if hasattr(o, "dtype") or callable(o):
            return str(o)
        return o

    (run_dir / "config.yaml").write_text(
        json.dumps(encode(cfg), indent=2, default=str)
    )
