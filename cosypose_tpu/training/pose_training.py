"""Pose-model training: loss closure, optimizer, and the pjit DP train step.

Capability match for the reference's ``cosypose/training/train_pose.py`` +
``pose_forward_loss.py``, re-architected for TPU:

  * The whole step — input-pose generation, N render-and-compare iterations
    (crop → rasterize → backbone → update), disentangled symmetric loss,
    backward, optimizer — is ONE jitted XLA program. The reference crosses
    process/device boundaries every iteration (mp-queue renders) and syncs
    gradients via DDP/NCCL (ref: train_pose.py:278-331).
  * Data parallelism is a 1-D ``data`` mesh: batch sharded over devices,
    params/opt-state replicated; XLA inserts the gradient all-reduce over ICI
    (replaces DDP, SURVEY.md §2.14).
  * Optimizer matches the reference schedule: Adam(3e-4), linear per-batch
    warmup over `n_epochs_warmup`, lr/10 every `lr_epoch_decay` epochs,
    global-norm grad clip 0.5 (ref: train_pose.py:282-299,327-331;
    scripts/run_pose_training.py:54-63).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.pose_predictor import PosePredictor, PosePredictorConfig
from ..ops.losses import (compute_ADD_L1_loss, loss_refiner_CO_disentangled,
                          loss_refiner_aux_regression)
from ..ops.pose_ops import TCO_init_from_boxes, TCO_init_from_boxes_zup_autodepth
from ..ops.transforms import add_pose_noise


@dataclasses.dataclass(frozen=True)
class PoseTrainConfig:
    # model
    predictor: PosePredictorConfig = PosePredictorConfig()
    n_iterations: int = 1                 # train-time refinement iterations
    input_generator: str = "fixed"        # fixed | gt+noise | fixed+trans_noise
    loss_disentangled: bool = True
    n_points_loss: int = 2600
    # auxiliary L2 regression to the closed-form optimal head outputs —
    # escapes the constant-identity basin orders of magnitude faster than the
    # L1 point loss alone (see ops/losses.py:loss_refiner_aux_regression);
    # 0.0 reproduces reference semantics
    aux_regression_weight: float = 0.0
    aux_rot_lever_m: float = 0.05
    # z-hypothesis weight in the disentangled loss (ops/losses.py z_weight;
    # measured low-SNR basis in scripts/diag_z.py); 1.0 = reference semantics
    z_loss_weight: float = 1.0
    # gt+noise input-generator magnitudes (ref: pose_forward_loss.py:36-40)
    noise_euler_deg: tuple = (15.0, 15.0, 15.0)
    noise_trans: tuple = (0.01, 0.01, 0.05)
    # apply the photometric jitter chain ON DEVICE inside the train step
    # (ops/image_aug.py) instead of Pillow on the host — the host here has a
    # single CPU core, so the Pillow chain serializes the input pipeline
    # (measured 270 ms/batch vs 180 ms device step). The host dataset must be
    # built with apply_rgb_augmentation=False when this is on.
    rgb_aug_device: bool = False
    rgb_aug_p: float = 0.4
    # optimizer (ref: scripts/run_pose_training.py:54-63)
    lr: float = 3e-4
    weight_decay: float = 0.0
    n_epochs_warmup: int = 50
    lr_epoch_decay: int = 500
    clip_grad_norm: float = 0.5
    batch_size: int = 32                  # per-device
    epoch_size: int = 115200
    n_epochs: int = 700


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def lr_schedule(cfg: PoseTrainConfig):
    """Per-step lr: linear warmup over warmup epochs, then 10× decay steps."""
    steps_per_epoch = max(1, cfg.epoch_size // cfg.batch_size)
    warmup_steps = cfg.n_epochs_warmup * steps_per_epoch

    def schedule(step):
        step = jnp.asarray(step)
        warm = jnp.minimum(1.0, (step + 1) / max(warmup_steps, 1))
        epoch = step // steps_per_epoch
        decay_exp = jnp.where(
            epoch >= cfg.n_epochs_warmup,
            (epoch // cfg.lr_epoch_decay).astype(jnp.float32),
            0.0,
        )
        return cfg.lr * warm * jnp.power(0.1, decay_exp)

    return schedule


def make_optimizer(cfg: PoseTrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_grad_norm),
        optax.adamw(lr_schedule(cfg), weight_decay=cfg.weight_decay)
        if cfg.weight_decay
        else optax.adam(lr_schedule(cfg)),
    )


def create_train_state(cfg: PoseTrainConfig, rng: jax.Array) -> tuple[PosePredictor, TrainState]:
    pp = PosePredictor(cfg.predictor)
    variables = pp.init(rng)
    tx = make_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
    return pp, state


def _make_TCO_init(cfg, batch, points, rng):
    """Train-time input pose generator (ref: pose_forward_loss.py:32-43)."""
    gen = cfg.input_generator
    if gen == "fixed":
        return TCO_init_from_boxes(batch["bboxes"], batch["K"], z_range=(1.0, 1.0))
    if gen == "gt+noise":
        return add_pose_noise(
            rng, batch["TCO"], euler_deg_std=cfg.noise_euler_deg,
            trans_std=cfg.noise_trans,
        )
    if gen == "fixed+trans_noise":
        TCO0 = TCO_init_from_boxes_zup_autodepth(batch["bboxes"], points, batch["K"])
        return add_pose_noise(
            rng, TCO0, euler_deg_std=(0.0, 0.0, 0.0), trans_std=(0.01, 0.01, 0.05)
        )
    raise ValueError(f"Unknown input generator {gen}")


def pose_loss(pp: PosePredictor, cfg: PoseTrainConfig, params, batch_stats,
              mesh_db, batch, rng, augment: bool = True):
    """Forward + per-iteration disentangled loss (ref: pose_forward_loss.py:17-84).

    batch: {images (B,3,H,W) float[0,1], K (B,3,3), TCO (B,4,4) GT,
            bboxes (B,4), label_ids (B,)}
    Returns (loss_scalar, (metrics, new_batch_stats)).
    """
    from ..models.pose_predictor import gather_mesh_data

    # images may arrive as uint8: the host->device transfer through the TPU
    # tunnel is bandwidth-bound (~20MB/s measured), so the float conversion
    # happens ON DEVICE (4x less PCIe/tunnel traffic per step)
    images = batch["images"]
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    batch = {**batch, "images": images}

    k_pts, k_init, k_fwd, k_aug = jax.random.split(rng, 4)
    if cfg.rgb_aug_device and augment:
        from ..ops.image_aug import color_jitter

        batch = {**batch, "images": color_jitter(
            k_aug, batch["images"], p=cfg.rgb_aug_p)}
    label_ids = batch["label_ids"]
    mesh_data = gather_mesh_data(
        mesh_db, label_ids, n_points_crop=cfg.predictor.n_points_crop
    )

    # per-step random loss point subset, shared across the batch
    # (ref: pose_forward_loss.py:29 — deterministic=False)
    P_max = mesh_db.points.shape[1]
    n_pts = min(cfg.n_points_loss, P_max)
    pt_ids = jax.random.choice(k_pts, P_max, (n_pts,), replace=False)
    points = jnp.take(
        jnp.take(mesh_db.points, label_ids, axis=0), pt_ids, axis=1
    )  # (B, n_pts, 3)

    # all symmetry-equivalent GT poses (ref: pose_forward_loss.py:30)
    syms = jnp.take(mesh_db.symmetries, label_ids, axis=0)  # (B, S, 4, 4)
    TCO_possible_gt = jnp.einsum(
        "bij,bsjk->bsik", batch["TCO"], syms,
        precision=jax.lax.Precision.HIGHEST,
    )

    TCO_init = _make_TCO_init(cfg, batch, points, k_init)
    variables = {"params": params, "batch_stats": batch_stats}
    outs = pp.forward(
        variables, mesh_data, batch["images"], batch["K"], TCO_init,
        n_iterations=cfg.n_iterations, train=True, rng=k_fwd,
    )

    def per_iter_loss(TCO_input, TCO_output, K_crop, pose_outputs):
        if cfg.loss_disentangled:
            l, comps = loss_refiner_CO_disentangled(
                TCO_possible_gt, TCO_input, pose_outputs, K_crop, points,
                pose_dim=cfg.predictor.pose_dim, return_components=True,
                z_weight=cfg.z_loss_weight,
            )
        else:
            l = compute_ADD_L1_loss(TCO_possible_gt[:, 0], TCO_output, points)
            comps = dict(loss_orn=l, loss_xy=l, loss_z=l)
        if cfg.aux_regression_weight > 0.0:
            aux = loss_refiner_aux_regression(
                TCO_possible_gt[:, 0], TCO_input, pose_outputs, K_crop,
                pose_dim=cfg.predictor.pose_dim,
                rot_lever_m=cfg.aux_rot_lever_m,
            )
            l = l + cfg.aux_regression_weight * aux
            comps = dict(comps, loss_aux=aux)
        return l, comps

    losses, comps = jax.vmap(per_iter_loss)(
        outs["TCO_input"], outs["TCO_output"], outs["K_crop"], outs["pose_outputs"]
    )  # (n_iter, B)
    loss = losses.mean()
    metrics = {"loss_total": loss}
    for n in range(cfg.n_iterations):
        metrics[f"loss_TCO-iter={n+1}"] = losses[n].mean()
    # per-component diagnostics (orn / xy / z heads), averaged over iterations
    for k, v in comps.items():
        metrics[k] = v.mean()
    return loss, (metrics, outs["batch_stats"])


def make_val_step(pp: PosePredictor, cfg: PoseTrainConfig, mesh_db,
                  mesh: Optional[Mesh] = None):
    """Forward-only loss for validation (no update, no batch-stat mutation)."""

    def val_step(state: TrainState, batch, rng):
        # no augmentation in validation (host path builds the val dataset
        # with apply_rgb_augmentation=False for the same reason)
        _, (metrics, _) = pose_loss(
            pp, cfg, state.params, state.batch_stats, mesh_db, batch, rng,
            augment=False,
        )
        return metrics

    if mesh is None:
        return jax.jit(val_step)
    batch_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        val_step,
        in_shardings=(replicated, batch_sharding, replicated),
        out_shardings=replicated,
    )


def make_train_step(pp: PosePredictor, cfg: PoseTrainConfig, mesh_db,
                    mesh: Optional[Mesh] = None,
                    param_mode: str = "replicated",
                    state: Optional[TrainState] = None):
    """Build the jitted DP train step.

    With a Mesh, the batch is sharded over the 'data' axis; XLA inserts the
    gradient collectives over ICI (replaces the reference's DDP/NCCL,
    SURVEY.md §2.14). Metrics come back already averaged over the global
    batch (replaces reduce_dict, ref: utils/distributed.py:72-98).

    param_mode:
      "replicated" — params/opt-state replicated, gradient all-reduce
                     (the reference's DDP semantics).
      "fsdp"       — params/opt-state sharded over the 'data' axis
                     (parallel.fsdp_shardings, ZeRO-style); XLA emits
                     per-layer all-gathers + gradient reduce-scatters.
                     Requires `state` to derive the sharding pytree.
    """

    def train_step(state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(
            lambda p: pose_loss(
                pp, cfg, p, state.batch_stats, mesh_db, batch, rng
            ),
            has_aux=True,
        )
        (loss, (metrics, new_bs)), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    batch_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    if param_mode == "fsdp":
        from ..parallel import fsdp_shardings

        assert state is not None, "fsdp needs the state to derive shardings"
        state_shardings = fsdp_shardings(mesh, state)
    elif param_mode == "replicated":
        state_shardings = replicated
    else:
        raise ValueError(f"unknown param_mode {param_mode!r}")
    return jax.jit(
        train_step,
        in_shardings=(state_shardings, batch_sharding, replicated),
        out_shardings=(state_shardings, replicated),
        donate_argnums=(0,),
    )
