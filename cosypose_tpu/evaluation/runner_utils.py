"""Evaluation orchestration: run meters over predictions, format results.

Capability match for the reference's ``cosypose/evaluation/runner_utils.py``
(run_pred_eval :11, format_results :44): every meter sees every prediction key,
and the result bundle carries the summary dict, a printable text table, the
per-metric dataframes and the raw predictions.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np

from ..utils.logging import get_logger

logger = get_logger(__name__)


def run_pred_eval(pred_runner, pred_kwargs, eval_runner, eval_preds=None):
    all_predictions = {}
    for pred_prefix, pred_kwargs_n in pred_kwargs.items():
        preds = pred_runner.get_predictions(**pred_kwargs_n)
        for preds_name, preds_n in preds.items():
            all_predictions[f"{pred_prefix}/{preds_name}"] = preds_n

    eval_metrics, eval_dfs = {}, {}
    if eval_runner is not None:
        for preds_k, preds in all_predictions.items():
            if eval_preds is None or preds_k in eval_preds:
                eval_metrics[preds_k], eval_dfs[preds_k] = eval_runner.evaluate(
                    preds
                )
    return format_results(all_predictions, eval_metrics, eval_dfs)


def format_results(predictions, eval_metrics, eval_dfs, print_metrics=True):
    summary, txt = {}, []
    for k, metrics in eval_metrics.items():
        txt.append(f"\n{k}")
        for k_, v in metrics.items():
            summary[f"{k}/{k_}"] = v
            txt.append(f"  {k_}: {v}")
    summary_txt = "\n".join(txt)
    if print_metrics:
        logger.info(summary_txt)
    return dict(
        summary=summary,
        summary_txt=summary_txt,
        predictions=predictions,
        metrics=eval_metrics,
        dfs=eval_dfs,
    )


def gather_predictions(all_predictions):
    """Single-controller JAX: all shards already local (the reference gathers
    through the shared filesystem here, ref: runner_utils.py:31-41)."""
    return all_predictions
