from .meters import PoseErrorMeter, DetectionMeter, compute_auc_posecnn
from .runner_utils import run_pred_eval, format_results
from .bop_export import predictions_to_bop_csv
