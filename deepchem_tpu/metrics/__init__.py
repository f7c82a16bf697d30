from deepchem_tpu.metrics.metric import (
    Metric, to_one_hot, from_one_hot, normalize_weight_shape,
    normalize_labels_shape, normalize_prediction_shape,
    handle_classification_mode, threshold_predictions)
from deepchem_tpu.metrics import genomic_metrics
from deepchem_tpu.metrics.score_function import (
    accuracy_score, balanced_accuracy_score, f1_score, jaccard_score,
    matthews_corrcoef, precision_score, recall_score, roc_auc_score,
    cohen_kappa_score, mean_absolute_error, mean_squared_error,
    median_absolute_error, r2_score, pearson_r2_score, pearsonr,
    jaccard_index, pixel_error, prc_auc_score, rms_score, mae_score,
    kappa_score, bedroc_score, concordance_index, rmse,
    auc, precision_recall_curve, top_k_accuracy_score)

__all__ = [
    'Metric', 'to_one_hot', 'from_one_hot', 'normalize_weight_shape',
    'normalize_labels_shape', 'normalize_prediction_shape',
    'handle_classification_mode', 'threshold_predictions',
    'accuracy_score', 'balanced_accuracy_score', 'f1_score',
    'jaccard_score', 'matthews_corrcoef', 'precision_score',
    'recall_score', 'roc_auc_score', 'cohen_kappa_score',
    'mean_absolute_error', 'mean_squared_error', 'median_absolute_error',
    'r2_score', 'pearson_r2_score', 'pearsonr', 'jaccard_index',
    'pixel_error', 'prc_auc_score', 'rms_score', 'mae_score', 'kappa_score',
    'auc', 'precision_recall_curve', 'top_k_accuracy_score',
    'bedroc_score', 'concordance_index', 'rmse', 'genomic_metrics',
]
