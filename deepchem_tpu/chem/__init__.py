"""Self-contained cheminformatics core (no RDKit required).

Provides SMILES parsing, molecule perception (implicit H, rings,
aromaticity, hybridization), canonical SMILES, Morgan/ECFP fingerprints,
and Bemis-Murcko scaffolds — the substrate under the featurization layer.
"""

from deepchem_tpu.chem.mol import (Atom, Bond, Molecule, PERIODIC_TABLE,
                                   ATOMIC_SYMBOL, ATOMIC_MASS)
from deepchem_tpu.chem.smiles import mol_from_smiles, SmilesParseError
from deepchem_tpu.chem.canon import mol_to_smiles, canonical_ranks
from deepchem_tpu.chem.fingerprints import (morgan_fingerprint,
                                            morgan_fingerprint_counts,
                                            sparse_morgan_fingerprint,
                                            tanimoto, bulk_tanimoto)
from deepchem_tpu.chem.scaffolds import murcko_scaffold, scaffold_smiles
from deepchem_tpu.chem.sdf import (mol_from_molblock, parse_sdf,
                                   mol_to_molblock, write_sdf)
from deepchem_tpu.chem.descriptors import (tpsa, chi0, chi1, kappa1,
                                            kappa2, kappa3,
                                            hall_kier_alpha,
                                            num_valence_electrons,
                                            crippen_logp)
from deepchem_tpu.chem.smarts import (Pattern, SmartsParseError,
                                      smarts_pattern, has_substructure,
                                      count_substructures,
                                      find_substructures)

__all__ = [
    'Atom', 'Bond', 'Molecule', 'PERIODIC_TABLE', 'ATOMIC_SYMBOL',
    'ATOMIC_MASS', 'mol_from_smiles', 'SmilesParseError', 'mol_to_smiles',
    'canonical_ranks', 'morgan_fingerprint', 'morgan_fingerprint_counts',
    'sparse_morgan_fingerprint', 'tanimoto', 'bulk_tanimoto',
    'murcko_scaffold', 'scaffold_smiles', 'mol_from_molblock', 'parse_sdf',
    'mol_to_molblock', 'write_sdf', 'Pattern', 'SmartsParseError',
    'smarts_pattern', 'has_substructure', 'count_substructures',
    'find_substructures', 'tpsa', 'chi0', 'chi1', 'kappa1', 'kappa2',
    'kappa3', 'hall_kier_alpha', 'num_valence_electrons', 'crippen_logp',
]
