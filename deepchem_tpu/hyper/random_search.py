"""Random search (reference deepchem/hyper/random_search.py:22)."""

from __future__ import annotations

import logging
import os
from typing import Callable, Dict, Optional

import numpy as np

from deepchem_tpu.hyper.base import (HyperparamOpt,
                                     _convert_hyperparam_dict_to_filename)

logger = logging.getLogger(__name__)


class RandomHyperparamOpt(HyperparamOpt):
    """Sample ``max_iter`` random configurations.  Values in ``params_dict``
    may be lists (sampled uniformly) or callables f(rng) -> value."""

    @classmethod
    def generate_random_hyperparam_values(cls, params_dict: Dict,
                                          n: int) -> list:
        """Generate ``n`` random hyperparameter combinations (reference
        random_search.py:253).  Iterable values are sampled uniformly;
        callables are invoked — zero-arg callables (e.g. scipy ``.rvs``)
        or f(rng) callables both work."""
        rng = np.random.RandomState()
        out = []
        for _ in range(n):
            combo = {}
            for p, v in params_dict.items():
                if callable(v):
                    try:
                        combo[p] = v()
                    except TypeError:
                        combo[p] = v(rng)
                elif isinstance(v, (list, tuple, np.ndarray)):
                    combo[p] = v[rng.randint(len(v))]
                else:
                    combo[p] = v
            out.append(combo)
        return out

    def hyperparam_search(self, params_dict: Dict, train_dataset,
                          valid_dataset, metric, output_transformers=(),
                          nb_epoch: int = 10, use_max: bool = True,
                          logdir: Optional[str] = None,
                          seed: Optional[int] = None, **kwargs):
        rng = np.random.RandomState(seed)
        best_validation_score = None
        best_model = None
        best_hyperparams = None
        all_scores = {}
        for trial in range(self.max_iter):
            model_params = {}
            for p, v in params_dict.items():
                if callable(v):
                    model_params[p] = v(rng)
                elif isinstance(v, (list, tuple)):
                    model_params[p] = v[rng.randint(len(v))]
                else:
                    model_params[p] = v
            hp_str = _convert_hyperparam_dict_to_filename(model_params)
            logger.info('trial %d: %s', trial, model_params)
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
                best_hyperparams = dict(model_params)
        return best_model, best_hyperparams, all_scores
