from .meters import PoseErrorMeter, DetectionMeter, compute_auc_posecnn
from .runner_utils import run_pred_eval, format_results
from .bop_export import predictions_to_bop_csv
from .pred_runners import (
    MultiviewPredictionRunner,
    BopPredictionRunner,
    DetectionRunner,
)
from .eval_runners import PoseEvaluation, DetectionEvaluation
from .data_utils import parse_obs_data
