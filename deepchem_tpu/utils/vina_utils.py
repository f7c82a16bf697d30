"""Deprecated AutoDock-Vina helpers (reference
``deepchem/utils/vina_utils.py``): the functions moved to
:mod:`deepchem_tpu.utils.docking_utils`; this module keeps the old
import path working with DeprecationWarnings, exactly like the
reference."""

import functools
import warnings

from deepchem_tpu.utils.docking_utils import (write_vina_conf,
                                              load_docked_ligands,
                                              prepare_inputs)


def deprecated(func):
    """Mark a function deprecated — warns on call (reference
    vina_utils.py:10)."""

    @functools.wraps(func)
    def new_func(*args, **kwargs):
        warnings.simplefilter('always', DeprecationWarning)
        warnings.warn(
            'Call to deprecated function {}. Please use the corresponding '
            'function in deepchem_tpu.utils.docking_utils.'.format(
                func.__name__),
            category=DeprecationWarning, stacklevel=2)
        warnings.simplefilter('default', DeprecationWarning)
        return func(*args, **kwargs)

    return new_func


write_vina_conf = deprecated(write_vina_conf)
load_docked_ligands = deprecated(load_docked_ligands)
prepare_inputs = deprecated(prepare_inputs)
