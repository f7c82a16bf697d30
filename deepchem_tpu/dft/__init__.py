from deepchem_tpu.dft.functionals import (lda_exchange, lda_correlation_vwn,
                                          pbe_exchange, pbe_correlation,
                                          lda_xc, pbe_xc)
from deepchem_tpu.dft.nnxc import NNLDA, NNPBE, HybridXC
from deepchem_tpu.dft.xcmodel import XCModel

__all__ = ['lda_exchange', 'lda_correlation_vwn', 'pbe_exchange',
           'pbe_correlation', 'lda_xc', 'pbe_xc', 'NNLDA', 'NNPBE',
           'HybridXC', 'XCModel']
