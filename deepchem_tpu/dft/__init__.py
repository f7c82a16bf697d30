from deepchem_tpu.dft.functionals import (lda_exchange, lda_correlation_vwn,
                                          pbe_exchange, pbe_correlation,
                                          lda_xc, pbe_xc)
from deepchem_tpu.dft.nnxc import NNLDA, NNPBE, HybridXC
from deepchem_tpu.dft.xcmodel import XCModel
from deepchem_tpu.dft.basis import (STO3G, BasisFunction, build_basis,
                                    nuclear_repulsion)
from deepchem_tpu.dft.grid import molecular_grid
from deepchem_tpu.dft.scf import (DFTSystem, KSCalc, KohnShamSCF, XCNNSCF,
                                  scf_loop, scf_loop_unrestricted,
                                  run_unrestricted, DFTEntry,
                                  parse_moldesc)
from deepchem_tpu.dft.gradients import (scf_gradient, optimize_geometry,
                                        ao_hessian, harmonic_frequencies,
                                        hessian_numerical,
                                        scf_gradient_unrestricted)
from deepchem_tpu.dft.tddft import (tda_excitations, cis_excitations,
                                    TDAResult)
from deepchem_tpu.dft.df import (even_tempered_aux, ri_fit, ri_tensors,
                                 ri_j)
from deepchem_tpu.dft.posthf import (mp2_energy, fci_2e_energy,
                                     dipole_moment, mulliken_charges,
                                     energy_in_field, polarizability)
from deepchem_tpu.dft.cc import (fci_energy, ccsd_energy,
                                 ccsd_t_energy)
from deepchem_tpu.dft.orbparams import (BaseOrbParams, QROrbParams,
                                        MatExpOrbParams,
                                        scf_direct_minimize)
from deepchem_tpu.dft.pbc import (Lattice, PBCIntOption,
                                  get_default_options,
                                  get_default_kpts, pbc_eval_gto,
                                  pbc_overlap, pbc_kinetic)
from deepchem_tpu.dft.radial import (get_xw_integration,
                                     BaseGridTransform,
                                     DE2Transformation,
                                     LogM3Transformation,
                                     TreutlerM4Transformation,
                                     get_grid_transform, BaseGrid,
                                     RadialGrid, SlicedRadialGrid,
                                     BaseTruncationRules, NoTrunc,
                                     NWChemTrunc, angular_quadrature,
                                     pruned_molecular_grid)

__all__ = ['lda_exchange', 'lda_correlation_vwn', 'pbe_exchange',
           'pbe_correlation', 'lda_xc', 'pbe_xc', 'NNLDA', 'NNPBE',
           'HybridXC', 'XCModel', 'STO3G', 'BasisFunction', 'build_basis',
           'nuclear_repulsion', 'molecular_grid', 'DFTSystem', 'KSCalc',
           'KohnShamSCF', 'XCNNSCF', 'scf_loop', 'scf_loop_unrestricted',
           'run_unrestricted', 'DFTEntry', 'parse_moldesc',
           'scf_gradient', 'optimize_geometry', 'ao_hessian',
           'mp2_energy', 'fci_2e_energy', 'dipole_moment',
           'mulliken_charges', 'energy_in_field', 'polarizability',
           'harmonic_frequencies', 'hessian_numerical',
           'even_tempered_aux', 'ri_fit', 'ri_tensors', 'ri_j',
           'scf_gradient_unrestricted', 'tda_excitations',
           'cis_excitations', 'TDAResult', 'fci_energy', 'ccsd_energy',
           'ccsd_t_energy', 'BaseOrbParams', 'QROrbParams',
           'MatExpOrbParams', 'scf_direct_minimize', 'Lattice',
           'PBCIntOption', 'get_default_options', 'get_default_kpts',
           'pbc_eval_gto', 'pbc_overlap', 'pbc_kinetic',
           'get_xw_integration', 'BaseGridTransform',
           'DE2Transformation', 'LogM3Transformation',
           'TreutlerM4Transformation', 'get_grid_transform',
           'BaseGrid', 'RadialGrid', 'SlicedRadialGrid',
           'BaseTruncationRules', 'NoTrunc', 'NWChemTrunc',
           'angular_quadrature', 'pruned_molecular_grid']
