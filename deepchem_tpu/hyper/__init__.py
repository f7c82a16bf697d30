from deepchem_tpu.hyper.base import HyperparamOpt
from deepchem_tpu.hyper.grid_search import GridHyperparamOpt
from deepchem_tpu.hyper.random_search import RandomHyperparamOpt
from deepchem_tpu.hyper.gaussian_process import GaussianProcessHyperparamOpt

__all__ = ['HyperparamOpt', 'GridHyperparamOpt', 'RandomHyperparamOpt',
           'GaussianProcessHyperparamOpt']
