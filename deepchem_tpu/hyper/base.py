"""Hyperparameter optimization base (reference deepchem/hyper/
base_classes.py:39)."""

from __future__ import annotations

from typing import Callable, Dict, Optional


def _convert_hyperparam_dict_to_filename(params: Dict) -> str:
    """(reference hyper/base_classes.py:12)"""
    filename = ''
    for key, value in sorted(params.items()):
        filename += f'_{key}'
        if isinstance(value, (int, float, str, bool)):
            filename += f'_{value}'
        elif isinstance(value, (list, tuple)):
            filename += '_' + '-'.join(str(v) for v in value)
        elif hasattr(value, '__name__'):
            filename += f'_{value.__name__}'
        else:
            filename += f'_{type(value).__name__}'
    return filename


class HyperparamOpt:
    """Abstract search over model hyperparameters.

    ``model_builder(**params) -> Model``
    """

    def __init__(self, model_builder: Callable, max_iter: int = 100):
        self.model_builder = model_builder
        self.max_iter = max_iter

    def hyperparam_search(self, params_dict: Dict, train_dataset,
                          valid_dataset, metric,
                          output_transformers=(),
                          nb_epoch: int = 10,
                          use_max: bool = True,
                          logdir: Optional[str] = None,
                          **kwargs):
        raise NotImplementedError
