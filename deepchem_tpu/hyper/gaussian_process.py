"""Gaussian-process hyperparameter search (reference deepchem/hyper/
gaussian_process.py:86, which uses pyGPGO; here implemented on sklearn's
GaussianProcessRegressor with expected-improvement acquisition)."""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Tuple

import numpy as np

from deepchem_tpu.hyper.base import (HyperparamOpt,
                                     _convert_hyperparam_dict_to_filename)

logger = logging.getLogger(__name__)


class GaussianProcessHyperparamOpt(HyperparamOpt):
    """Bayesian optimization over numeric hyperparameter ranges.

    ``params_dict`` values are (low, high) tuples for continuous params or
    (low, high, 'int') for integers; list values are treated as categorical
    and sampled randomly per trial.
    """

    def hyperparam_search(self, params_dict: Dict, train_dataset,
                          valid_dataset, metric, output_transformers=(),
                          nb_epoch: int = 10, use_max: bool = True,
                          logdir: Optional[str] = None,
                          max_iter: Optional[int] = None,
                          seed: Optional[int] = None, **kwargs):
        from sklearn.gaussian_process import GaussianProcessRegressor
        from sklearn.gaussian_process.kernels import Matern
        from scipy.stats import norm
        rng = np.random.RandomState(seed)
        max_iter = max_iter or self.max_iter
        cont_keys = [k for k, v in params_dict.items()
                     if isinstance(v, tuple)]
        cat_keys = [k for k, v in params_dict.items()
                    if isinstance(v, list)]
        fixed = {k: v for k, v in params_dict.items()
                 if not isinstance(v, (tuple, list))}

        def sample_x() -> np.ndarray:
            return np.array([rng.uniform(params_dict[k][0],
                                         params_dict[k][1])
                             for k in cont_keys])

        def to_params(x: np.ndarray) -> Dict:
            out = dict(fixed)
            for i, k in enumerate(cont_keys):
                v = float(x[i])
                if len(params_dict[k]) > 2 and params_dict[k][2] == 'int':
                    v = int(round(v))
                out[k] = v
            for k in cat_keys:
                out[k] = params_dict[k][rng.randint(len(params_dict[k]))]
            return out

        X_obs, y_obs = [], []
        best_model = best_hyperparams = None
        best_score = None
        all_scores = {}
        n_random = min(5, max_iter)
        for trial in range(max_iter):
            if trial < n_random or not cont_keys:
                x = sample_x() if cont_keys else np.zeros(0)
            else:
                gp = GaussianProcessRegressor(
                    kernel=Matern(nu=2.5), normalize_y=True,
                    random_state=seed)
                gp.fit(np.asarray(X_obs), np.asarray(y_obs))
                # expected improvement over candidate pool
                cands = np.stack([sample_x() for _ in range(256)])
                mu, sigma = gp.predict(cands, return_std=True)
                y_best = np.max(y_obs)
                with np.errstate(divide='ignore'):
                    z = (mu - y_best) / np.maximum(sigma, 1e-9)
                    ei = (mu - y_best) * norm.cdf(z) + sigma * norm.pdf(z)
                x = cands[int(np.argmax(ei))]
            model_params = to_params(x)
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
            signed = score if use_max else -score
            X_obs.append(x)
            y_obs.append(signed)
            if best_score is None or signed > best_score:
                best_score = signed
                best_model = model
                best_hyperparams = model_params
            logger.info('GP trial %d score %g', trial, score)
        return best_model, best_hyperparams, all_scores
