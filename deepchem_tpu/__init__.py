"""deepchem_tpu: a TPU-native deep-learning framework for molecular ML.

Brand-new JAX/XLA/Pallas implementation with the capabilities of DeepChem
(reference layer map in SURVEY.md): chemistry-aware data pipeline, a single
JAX training engine behind DeepChem's ``fit/predict/evaluate`` API, a
molecular model zoo on fused segment-op kernels, and the MoleculeNet
benchmark suite.
"""

__version__ = '0.1.0'

from deepchem_tpu import chem
from deepchem_tpu import utils
from deepchem_tpu import feat
from deepchem_tpu import data

# heavier subpackages (models, molnet) import jax; keep them lazy-friendly
# but eagerly imported like the reference (deepchem/__init__.py:1-19)
try:
    from deepchem_tpu import splits
    from deepchem_tpu import trans
    from deepchem_tpu import metrics
    from deepchem_tpu import models
    from deepchem_tpu import hyper
    from deepchem_tpu import molnet
    from deepchem_tpu import dock
    from deepchem_tpu import rl
    from deepchem_tpu import metalearning
    from deepchem_tpu import parallel
    from deepchem_tpu import ops
    from deepchem_tpu import dft
    from deepchem_tpu import serving
except ImportError:   # partial builds during bootstrap
    pass
