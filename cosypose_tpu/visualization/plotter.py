"""Image/detection/overlay plotting + training-log dashboards (matplotlib).

Capability match for the reference's bokeh ``cosypose/visualization/plotter.py``
and the log dashboards in ``cosypose/utils/logs_bokeh.py`` (bokeh is not in
this image; matplotlib covers the same surface: image grids, bbox/mask
overlays, multi-run training curves from log.txt jsonlines).
"""

from __future__ import annotations

import json
import pathlib

import numpy as np


class Plotter:
    def __init__(self):
        import matplotlib

        matplotlib.use("Agg")

    def plot_image(self, image, ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots()
        img = np.asarray(image)
        if img.ndim == 3 and img.shape[0] in (1, 3):
            img = np.transpose(img, (1, 2, 0))
        if img.dtype != np.uint8 and img.max() <= 1.0:
            img = (img * 255).astype(np.uint8)
        ax.imshow(img)
        ax.axis("off")
        return ax

    def plot_detections(self, ax, detections, color="lime"):
        import matplotlib.patches as patches

        boxes = np.asarray(detections.bboxes)
        for n in range(len(detections)):
            x1, y1, x2, y2 = boxes[n]
            ax.add_patch(
                patches.Rectangle(
                    (x1, y1), x2 - x1, y2 - y1, fill=False, color=color, lw=1.5
                )
            )
            label = detections.infos["label"].iloc[n]
            score = detections.infos.get("score")
            txt = label if score is None else f"{label} {score.iloc[n]:.2f}"
            ax.text(x1, y1 - 2, txt, color=color, fontsize=7)
        return ax

    def plot_overlay(self, rgb_input, rgb_rendered, alpha=0.6, ax=None):
        """Prediction-over-input overlay (ref: visualization/singleview.py:37-63)."""
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots()
        inp = np.asarray(rgb_input, np.float32)
        ren = np.asarray(rgb_rendered, np.float32)
        if inp.shape[0] in (1, 3) and inp.ndim == 3:
            inp = np.transpose(inp, (1, 2, 0))
        if ren.shape[0] in (1, 3) and ren.ndim == 3:
            ren = np.transpose(ren, (1, 2, 0))
        if inp.max() > 1:
            inp = inp / 255.0
        if ren.max() > 1:
            ren = ren / 255.0
        mask = (ren.sum(-1) > 0)[..., None]
        overlay = np.where(mask, alpha * ren + (1 - alpha) * inp, inp)
        ax.imshow(np.clip(overlay, 0, 1))
        ax.axis("off")
        return ax

    def save(self, fig_or_ax, path):
        import matplotlib.pyplot as plt

        fig = getattr(fig_or_ax, "figure", fig_or_ax)
        fig.savefig(path, bbox_inches="tight", dpi=120)
        plt.close(fig)


def plot_training_logs(run_dirs, metrics=("train/loss_total",), out_path=None):
    """Multi-run training curves from log.txt jsonlines
    (ref: utils/logs_bokeh.py:32-65)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(metrics), figsize=(5 * len(metrics), 4),
                             squeeze=False)
    for run_dir in run_dirs:
        run_dir = pathlib.Path(run_dir)
        log = run_dir / "log.txt"
        if not log.exists():
            continue
        records = [json.loads(l) for l in log.read_text().splitlines() if l.strip()]
        for m, ax in zip(metrics, axes[0]):
            xs = [r["epoch"] for r in records if m in r]
            ys = [r[m] for r in records if m in r]
            ax.plot(xs, ys, label=run_dir.name)
            ax.set_xlabel("epoch")
            ax.set_title(m)
    for ax in axes[0]:
        ax.legend(fontsize=7)
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
    return fig
