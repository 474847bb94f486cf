"""Named training configurations.

Capability match for the reference's de-facto flag system
(ref: cosypose/scripts/run_pose_training.py:11-195): an argparse-style named
config string resolves to a full hyperparameter set. Key defaults mirror the
reference: lr 3e-4, batch 32/device, epoch_size 115200, 700 epochs, warmup 50,
lr/10 every 500 epochs, grad clip 0.5, n_pose_dims 9, n_points_loss 2600,
coarse input 'fixed'/'fixed+trans_noise', refiner input 'gt+noise'.
"""

from __future__ import annotations

import dataclasses

from ..models.pose_predictor import PosePredictorConfig
from .pose_training import PoseTrainConfig


@dataclasses.dataclass
class RunConfig:
    run_id: str
    train: PoseTrainConfig
    train_ds_names: tuple = ()
    val_ds_names: tuple = ()
    object_ds_name: str = ""
    n_dataloader_workers: int = 8
    val_epoch_interval: int = 10
    test_epoch_interval: int = 30
    save_epoch_interval: int = 1
    input_resize: tuple = (480, 640)  # dataset image size fed to the model
    rgb_augmentation: bool = True     # train-time photometric augmentation


# BOP dataset training configs are generated from this table
# (ref: cosypose/bop_config.py + run_pose_training.py:73-104)
_BOP_DS = ("lm", "lmo", "tless", "tudl", "icbin", "itodd", "hb", "ycbv")


def make_cfg(config_name: str, debug: bool = False) -> RunConfig:
    predictor = PosePredictorConfig(backbone="efficientnet-b3")
    train = PoseTrainConfig(predictor=predictor)

    def base(run_id, **kw):
        t = dataclasses.replace(train, **kw)
        return RunConfig(run_id=run_id, train=t)

    if config_name.startswith("tless-coarse") or config_name.startswith(
        "tless-refiner"
    ):
        # tless-{coarse|refiner}[-ablation-{loss|network|rot|augm}]
        # (ref: scripts/run_pose_training.py:134-167)
        kind = "coarse" if config_name.startswith("tless-coarse") else "refiner"
        kw = dict(
            input_generator="fixed" if kind == "coarse" else "gt+noise",
            n_iterations=1 if kind == "coarse" else 3,
        )
        rgb_augmentation = True
        if config_name.endswith("-ablation-loss"):
            kw["loss_disentangled"] = False
        elif config_name.endswith("-ablation-network"):
            kw["predictor"] = dataclasses.replace(predictor,
                                                  backbone="flownet")
        elif config_name.endswith("-ablation-rot"):
            kw["predictor"] = dataclasses.replace(predictor, pose_dim=7)
        elif config_name.endswith("-ablation-augm"):
            rgb_augmentation = False
        elif config_name not in ("tless-coarse", "tless-refiner"):
            raise ValueError(f"Unknown config {config_name}")
        cfg = base(config_name, **kw)
        cfg.train_ds_names = (("synthetic.tless-1M.train", 1),
                              ("tless.primesense.train", 5))
        cfg.val_ds_names = (("synthetic.tless-1M.val", 1),)
        cfg.object_ds_name = "tless.cad"
        cfg.input_resize = (540, 720)
        cfg.rgb_augmentation = rgb_augmentation
    elif config_name == "ycbv-refiner-syntonly":
        cfg = base("ycbv-refiner-syntonly", input_generator="gt+noise",
                   n_iterations=3)
        cfg.train_ds_names = (("synthetic.ycbv-1M.train", 1),)
        cfg.object_ds_name = "ycbv.bop-compat"
    elif config_name == "ycbv-refiner-finetune":
        cfg = base("ycbv-refiner-finetune", input_generator="gt+noise",
                   n_iterations=3)
        cfg.train_ds_names = (("synthetic.ycbv-1M.train", 1),
                              ("ycbv.train.synt.real", 3))
        cfg.object_ds_name = "ycbv.bop-compat"
    elif config_name in ("procedural-coarse", "procedural-refiner"):
        # Data-free end-to-end regression configs: short schedule over the
        # recorded procedural pile dataset (scripts/run_dataset_recording
        # --config procedural). Used by the framework's own accuracy loop —
        # the rebuild's analog of the reference's pinned T-LESS numbers
        # (ref README.md:264-277).
        import jax.numpy as jnp

        kind = config_name.split("-")[1]
        small = dataclasses.replace(
            predictor, compute_dtype=jnp.bfloat16,
        )
        if kind == "coarse":
            cfg = base(config_name, predictor=small,
                       input_generator="fixed+trans_noise", n_iterations=1,
                       batch_size=32, epoch_size=6400, n_epochs=40,
                       n_epochs_warmup=2, n_points_loss=600)
        else:
            cfg = base(config_name, predictor=small,
                       input_generator="gt+noise", n_iterations=3,
                       batch_size=32, epoch_size=6400, n_epochs=40,
                       n_epochs_warmup=2, n_points_loss=600)
        cfg.train_ds_names = (("synthetic.procedural-4k.train", 1),)
        cfg.val_ds_names = (("synthetic.procedural-4k.val", 1),)
        cfg.object_ds_name = "procedural"
        cfg.input_resize = (240, 320)
        cfg.val_epoch_interval = 5
    elif config_name.startswith("procedural-diag"):
        # Short diagnostic arms for the refiner learning-dynamics study:
        # procedural-diag[-rot][-gap][-nodiff][-lr<x>] — translation-only
        # noise by default (the xy/z error is directly observable in the
        # render-vs-crop comparison, so it isolates whether the signal path
        # works at all from whether rotation regression is slow).
        import jax.numpy as jnp

        mini = dataclasses.replace(
            predictor,
            backbone="corrnet" if "-corr" in config_name else "wide-resnet18",
            render_size=(120, 160),
            compute_dtype=jnp.bfloat16,
            pooling=("gap" if "-gap" in config_name else
                     "gap+moments+flatten" if "-flat" in config_name else
                     "gap+moments")
            + ("+scale" if "sc" in config_name.split("-") else "")
            + ("+lk" if "-lk" in config_name else ""),
            input_mode=("obs+render" if "-nodiff" in config_name
                        else "obs+render+diff"),
        )
        lr = 1e-3
        aux = None
        lever = 0.05
        n_epochs = None
        n_iterations = 1
        z_weight = 1.0
        # "-rot" arm: the reference's full SE(3) refiner noise (±15° euler,
        # ref pose_forward_loss.py:36-40); "rot<N>" picks another magnitude
        rot_deg = 0.0
        for part in config_name.split("-"):
            if part.startswith("lr"):
                lr = float(part[2:])
            elif part.startswith("vs"):
                mini = dataclasses.replace(mini, vxvy_scale=float(part[2:]))
            elif part.startswith("aux"):
                aux = float(part[3:])
            elif part.startswith("ep"):
                n_epochs = int(part[2:])
            elif part.startswith("it"):
                n_iterations = int(part[2:])
            elif part.startswith("lev"):
                # aux rot lever arm (meters-equivalent weight on the dR
                # residual). The principled default 0.05 puts a ~30x smaller
                # gradient on the rot head than on z; larger levers equalize.
                lever = float(part[3:])
            elif part == "rot":
                rot_deg = 15.0
            elif part.startswith("rot"):
                rot_deg = float(part[3:])
            elif part.startswith("hi"):
                # pose-head kernel init scale (0 = zero-init identity start;
                # >0 breaks the rotation-gradient deadlock — see
                # PosePredictorConfig.head_init_scale)
                mini = dataclasses.replace(
                    mini, head_init_scale=float(part[2:]))
            elif part == "b3":
                # backbone-parity arm: the B3 flagship backbone at the same
                # budget/data as the WRN18 arm — the accuracy half of the
                # flagship-selection argument (README "Per-stage roofline")
                mini = dataclasses.replace(mini, backbone="efficientnet-b3")
            elif part == "fp32":
                # B3 learning-dynamics lever: full-fp32 backbone (bf16
                # BatchNorm statistics are a suspect for the flat r4 B3 arm)
                mini = dataclasses.replace(mini, compute_dtype=jnp.float32)
            elif part == "dc0":
                # B3 lever: disable stochastic depth (drop_connect)
                mini = dataclasses.replace(mini, drop_connect_rate=0.0)
            elif part.startswith("zw"):
                # z-hypothesis loss weight (diag_z: z is the low-SNR head)
                z_weight = float(part[2:])
        # coarse arms must recover rotation from the ~120°-off z-up box init;
        # the L1 point loss alone plateaus at the constant-identity basin on
        # this budget (measured r3: rot_deg_median 120°→137°, 128k samples),
        # so coarse defaults to the aux L2 regression escape (linear dynamics
        # on dR — ops/losses.py:loss_refiner_aux_regression) + a 3x schedule.
        # Rot-noise refiner arms get the same escape for the same reason.
        if aux is None:
            aux = 0.3 if ("-coarse" in config_name or rot_deg > 0.0) else 0.0
        if n_epochs is None:
            n_epochs = 60 if "-coarse" in config_name else 20
        noise_euler = (rot_deg,) * 3
        # "-coarse" arm: box-seeded init (z-up auto-depth + translation noise,
        # the pipeline's detection-time init — ref pose_forward_loss.py:32-36
        # 'fixed' generator) instead of noisy GT, so the trained model slots in
        # as the coarse stage of detector→coarse→refiner.
        gen = "fixed+trans_noise" if "-coarse" in config_name else "gt+noise"
        cfg = base(config_name, predictor=mini,
                   input_generator=gen, n_iterations=n_iterations,
                   batch_size=64, epoch_size=6400, n_epochs=n_epochs,
                   n_epochs_warmup=1, n_points_loss=600, lr=lr,
                   noise_euler_deg=noise_euler,
                   noise_trans=(0.01, 0.01, 0.03),
                   aux_regression_weight=aux, aux_rot_lever_m=lever,
                   z_loss_weight=z_weight,
                   # "-devaug": photometric jitter on device (single-core
                   # host serializes the Pillow chain — ops/image_aug.py)
                   rgb_aug_device="-devaug" in config_name)
        ds = ("procedural-texsolo" if "-texsolo" in config_name else
              "procedural-solo" if "-solo" in config_name else
              "procedural-canon")
        cfg.train_ds_names = ((f"synthetic.{ds}.train", 1),)
        cfg.val_ds_names = ((f"synthetic.{ds}.val", 1),)
        # the texsolo tier records the sine-textured object set
        cfg.object_ds_name = ("procedural-tex" if "-texsolo" in config_name
                              else "procedural")
        cfg.input_resize = (120, 160)
        cfg.val_epoch_interval = 10
        # dense in-training eval-bundle curve (matched-AUC / per-pair ADD
        # every 5 epochs → log.jsonl → docs/dashboard.html), the reference's
        # logs_bokeh eval plots capability (ref utils/logs_bokeh.py:17-65)
        cfg.test_epoch_interval = 5
    elif config_name == "procedural-refiner-mini-moments":
        # mini config + spatial-moment pooling: plain GAP hides the
        # observed-vs-rendered image offset from the head behind zero-padding
        # border effects (the reference burns an 80.6M-sample schedule
        # learning through them, ref scripts/run_pose_training.py:61-63);
        # moment pooling exposes it directly. The framework's demonstrated
        # held-out refinement regression trains this config.
        import jax.numpy as jnp

        mini = dataclasses.replace(
            predictor, backbone="wide-resnet18", render_size=(120, 160),
            compute_dtype=jnp.bfloat16, pooling="gap+moments",
        )
        cfg = base(config_name, predictor=mini,
                   input_generator="gt+noise", n_iterations=1,
                   batch_size=64, epoch_size=6400, n_epochs=150,
                   n_epochs_warmup=1, n_points_loss=600, lr=1e-3,
                   noise_euler_deg=(10.0, 10.0, 10.0),
                   noise_trans=(0.01, 0.01, 0.03))
        cfg.train_ds_names = (("synthetic.procedural-canon.train", 1),)
        cfg.val_ds_names = (("synthetic.procedural-canon.val", 1),)
        cfg.object_ds_name = "procedural"
        cfg.input_resize = (120, 160)
        cfg.val_epoch_interval = 10
    elif config_name == "procedural-refiner-mini":
        # Fast-learning regression config: the full-size B3 schedule needs the
        # reference's 80M-sample budget to leave the identity floor (measured:
        # 0.14M samples land exactly at the identity-prediction loss). This
        # one demonstrates end-to-end refinement LEARNING in <1M samples:
        # small backbone, small render, one iteration, gentler noise.
        import jax.numpy as jnp

        mini = dataclasses.replace(
            predictor, backbone="wide-resnet18", render_size=(120, 160),
            compute_dtype=jnp.bfloat16,
        )
        cfg = base(config_name, predictor=mini,
                   input_generator="gt+noise", n_iterations=1,
                   batch_size=64, epoch_size=6400, n_epochs=60,
                   n_epochs_warmup=1, n_points_loss=600, lr=1e-3,
                   noise_euler_deg=(10.0, 10.0, 10.0),
                   noise_trans=(0.01, 0.01, 0.03))
        cfg.train_ds_names = (("synthetic.procedural-canon.train", 1),)
        cfg.val_ds_names = (("synthetic.procedural-canon.val", 1),)
        cfg.object_ds_name = "procedural"
        cfg.input_resize = (120, 160)
        cfg.val_epoch_interval = 10
    elif config_name.startswith("bop-"):
        # bop-<ds>-{pbr|synt+real}-{coarse|refiner}
        parts = config_name.split("-")
        ds, data, kind = parts[1], parts[2], parts[3]
        assert ds in _BOP_DS, ds
        if kind == "coarse":
            cfg = base(config_name, input_generator="fixed+trans_noise",
                       n_iterations=1)
        else:
            cfg = base(config_name, input_generator="gt+noise", n_iterations=3)
        split = "train.pbr" if data == "pbr" else "train.synt.real"
        cfg.train_ds_names = ((f"{ds}.{split}", 1),)
        cfg.object_ds_name = f"{ds}.models"
    else:
        raise ValueError(f"Unknown config {config_name}")

    if debug:
        cfg.train = dataclasses.replace(
            cfg.train, n_epochs=4, batch_size=4, epoch_size=16,
            n_epochs_warmup=1,
        )
        cfg.n_dataloader_workers = 0
        # debug smoke runs must never write into (and prune!) the real run's
        # checkpoint directory
        cfg.run_id = f"{cfg.run_id}-debug"
    return cfg
