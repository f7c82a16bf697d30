"""Reference import path for the atom/bond feature helpers (reference
``deepchem/utils/molecule_feature_utils.py``).  The implementations live
in :mod:`deepchem_tpu.feat.feature_utils`; this module keeps the
reference's import location working."""

from deepchem_tpu.feat.feature_utils import *          # noqa: F401,F403
from deepchem_tpu.feat import feature_utils as _fu

__all__ = [n for n in dir(_fu) if not n.startswith('_')]
