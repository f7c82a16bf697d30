"""Grid search (reference deepchem/hyper/grid_search.py:24)."""

from __future__ import annotations

import itertools
import logging
import os
from typing import Dict, Optional

from deepchem_tpu.hyper.base import (HyperparamOpt,
                                     _convert_hyperparam_dict_to_filename)

logger = logging.getLogger(__name__)


class GridHyperparamOpt(HyperparamOpt):
    """Exhaustive product over a dict of value lists."""

    def hyperparam_search(self, params_dict: Dict, train_dataset,
                          valid_dataset, metric, output_transformers=(),
                          nb_epoch: int = 10, use_max: bool = True,
                          logdir: Optional[str] = None, **kwargs):
        hyperparams = sorted(params_dict.keys())
        hyperparam_vals = [params_dict[p]
                           if isinstance(params_dict[p], (list, tuple))
                           else [params_dict[p]] for p in hyperparams]
        best_validation_score = None
        best_model = None
        best_hyperparams = None
        all_scores = {}
        for values in itertools.product(*hyperparam_vals):
            model_params = dict(zip(hyperparams, values))
            logger.info('Fitting model with %s', model_params)
            hp_str = _convert_hyperparam_dict_to_filename(model_params)
            if logdir is not None:
                model_dir = os.path.join(logdir, hp_str)
                os.makedirs(model_dir, exist_ok=True)
                model_params['model_dir'] = model_dir
            model = self.model_builder(**model_params)
            model.fit(train_dataset, nb_epoch=nb_epoch)
            scores = model.evaluate(valid_dataset, [metric],
                                    output_transformers)
            score = scores[metric.name]
            all_scores[hp_str] = score
            better = (best_validation_score is None or
                      (use_max and score > best_validation_score) or
                      (not use_max and score < best_validation_score))
            if better:
                best_validation_score = score
                best_model = model
                best_hyperparams = dict(zip(hyperparams, values))
        return best_model, best_hyperparams, all_scores
