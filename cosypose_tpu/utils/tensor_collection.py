"""The framework's interchange type: batched device arrays + a host metadata table.

Capability match for the reference's ``cosypose/utils/tensor_collection.py``
(TensorCollection / PandasTensorCollection) — THE type every pipeline stage
passes to the next (detections → coarse poses → refined poses → matched
candidates → BA scene; SURVEY.md §2.1). TPU-native differences:

  * Device tensors are jax arrays with FIXED shapes; rows beyond ``n_valid``
    are padding (XLA needs static shapes — the reference's rows are ragged).
    ``pad_to`` / ``trimmed`` convert between padded device layout and exact
    host rows at the jit boundary.
  * The ``infos`` table is a pandas DataFrame exactly like the reference's,
    row-aligned with the tensors.
  * Distributed gather is fixed-shape: each shard pads to a common row count,
    one all-gather over ICI, host trims — replacing the reference's
    torch.save-to-shared-tmpdir + barrier gather (ref: tensor_collection.py:142-163).
"""

from __future__ import annotations

import pathlib
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd


class TensorCollection:
    """Dict-of-arrays with attribute access, slicing, and pytree support.

    (ref: cosypose/utils/tensor_collection.py:22-102)
    """

    def __init__(self, **tensors):
        self.__dict__["_tensors"] = {}
        for k, v in tensors.items():
            self.register_tensor(k, v)

    def register_tensor(self, name, tensor):
        self._tensors[name] = tensor

    def delete_tensor(self, name):
        self._tensors.pop(name)

    @property
    def tensors(self):
        return self._tensors

    def __getattr__(self, name):
        t = self.__dict__.get("_tensors", {})
        if name in t:
            return t[name]
        raise AttributeError(name)

    def __setattr__(self, name, value):
        if "_tensors" in self.__dict__ and name in self._tensors:
            self._tensors[name] = value
        else:
            object.__setattr__(self, name, value)

    def __getitem__(self, ids):
        return type(self)(**{k: v[ids] for k, v in self._tensors.items()})

    def __len__(self):
        return len(next(iter(self._tensors.values())))

    def clone(self):
        return type(self)(**dict(self._tensors))

    def to_numpy(self):
        return type(self)(**{k: np.asarray(v) for k, v in self._tensors.items()})

    def __repr__(self):
        lines = [f"{type(self).__name__}("]
        for k, v in self._tensors.items():
            lines.append(f"    {k}: {getattr(v, 'shape', None)} {getattr(v, 'dtype', '')},")
        lines.append(")")
        return "\n".join(lines)


class PandasTensorCollection(TensorCollection):
    """TensorCollection + row-aligned pandas infos.

    (ref: cosypose/utils/tensor_collection.py:105-174)
    """

    def __init__(self, infos: pd.DataFrame, **tensors):
        super().__init__(**tensors)
        object.__setattr__(self, "infos", infos.reset_index(drop=True))

    def __getitem__(self, ids):
        if isinstance(ids, (list, np.ndarray)):
            idx = np.asarray(ids)
        elif isinstance(ids, slice):
            idx = np.arange(len(self))[ids]
        else:
            idx = np.asarray(ids)
        tensors = {k: jnp.take(v, jnp.asarray(idx), axis=0)
                   if isinstance(v, jax.Array) else v[idx]
                   for k, v in self._tensors.items()}
        return PandasTensorCollection(self.infos.iloc[idx], **tensors)

    def clone(self):
        return PandasTensorCollection(self.infos.copy(), **dict(self._tensors))

    def merge_df(self, df, *args, **kwargs):
        """Left-merge extra columns into infos, preserving row order.
        (ref: tensor_collection.py:120-126)"""
        infos = self.infos.copy()
        infos["_order"] = np.arange(len(infos))
        infos = infos.merge(df, *args, **kwargs).sort_values("_order")
        del infos["_order"]
        return PandasTensorCollection(infos, **dict(self._tensors))

    def pad_to(self, n_rows: int, fill=0.0):
        """Pad every tensor (and mark infos) to a fixed row count for jit."""
        n = len(self)
        assert n <= n_rows, (n, n_rows)
        pad = n_rows - n

        def _pad(v):
            if pad == 0:
                return v
            cfg = [(0, pad)] + [(0, 0)] * (np.ndim(v) - 1)
            return jnp.pad(v, cfg, constant_values=fill)

        tensors = {k: _pad(v) for k, v in self._tensors.items()}
        return PandasTensorCollection(self.infos, **tensors), n

    def trimmed(self, n_valid: int):
        """Drop padding rows (host-side, after leaving jit)."""
        return self[np.arange(n_valid)]

    def gather_distributed(self, mesh=None):
        """Gather shards to replicated arrays over the mesh.

        Fixed-shape all-gather over ICI replacing the reference's
        shared-filesystem gather (ref: tensor_collection.py:142-163). Call on
        padded collections whose tensors are sharded along rows; infos must be
        concatenated host-side by the caller (host metadata does not ride ICI).
        """
        if mesh is None:
            return self
        from jax.sharding import NamedSharding, PartitionSpec as P

        out = {}
        for k, v in self._tensors.items():
            out[k] = jax.device_put(v, NamedSharding(mesh, P()))
        return PandasTensorCollection(self.infos, **out)

    def gather_multihost(self, gather_dir, process_id=None, n_processes=None,
                         timeout_s: float = 600.0):
        """Shared-filesystem gather of RAGGED per-process collections.

        The capability match for the reference's file-based distributed
        gather (ref: cosypose/utils/tensor_collection.py:142-163 +
        utils/distributed.py): every process writes its shard (infos + numpy
        tensors) to <gather_dir>/<pid>.pkl atomically, polls until all shards
        exist, then returns the row-concatenation in process order. No
        collective is required — ragged host metadata cannot ride ICI — so
        this also works before/without jax.distributed initialization.
        """
        import pickle
        import time

        if process_id is None:
            process_id = jax.process_index()
        if n_processes is None:
            n_processes = jax.process_count()
        if n_processes == 1:
            return self

        gather_dir = pathlib.Path(gather_dir)
        gather_dir.mkdir(parents=True, exist_ok=True)
        payload = dict(
            infos=self.infos,
            tensors={k: np.asarray(v) for k, v in self._tensors.items()},
        )
        tmp = gather_dir / f"{process_id}.pkl.tmp"
        final = gather_dir / f"{process_id}.pkl"
        if final.exists():
            # a stale shard from a previous run into the same dir would
            # silently merge into this gather — refuse instead (same guard
            # as meters._gather_frame_lists; use a fresh per-run dir)
            raise FileExistsError(
                f"{final} already exists: gather_dir was already used by a "
                f"previous gather; point each run at a fresh directory"
            )
        tmp.write_bytes(pickle.dumps(payload))
        tmp.rename(final)  # atomic publish

        deadline = time.time() + timeout_s
        paths = [gather_dir / f"{p}.pkl" for p in range(n_processes)]
        while not all(p.exists() for p in paths):
            if time.time() > deadline:
                missing = [str(p) for p in paths if not p.exists()]
                raise TimeoutError(f"gather timed out waiting for {missing}")
            time.sleep(0.05)

        shards = [pickle.loads(p.read_bytes()) for p in paths]
        infos = pd.concat(
            [s["infos"] for s in shards], axis=0, sort=False
        ).reset_index(drop=True)
        tensors = {
            k: jnp.asarray(
                np.concatenate([s["tensors"][k] for s in shards], axis=0)
            )
            for k in shards[0]["tensors"]
        }
        return PandasTensorCollection(infos, **tensors)

    def __repr__(self):
        return (
            super().__repr__()
            + "\n"
            + "-" * 40
            + "\n"
            + repr(self.infos)
        )


def concatenate(collections: Iterable[PandasTensorCollection]) -> PandasTensorCollection:
    """Row-concatenate collections (ref: tensor_collection.py:7-19)."""
    collections = list(collections)
    assert collections, "nothing to concatenate"
    infos = pd.concat([c.infos for c in collections], axis=0, sort=False).reset_index(
        drop=True
    )
    keys = collections[0].tensors.keys()
    tensors = {
        k: jnp.concatenate([jnp.asarray(c.tensors[k]) for c in collections], axis=0)
        for k in keys
    }
    return PandasTensorCollection(infos, **tensors)
