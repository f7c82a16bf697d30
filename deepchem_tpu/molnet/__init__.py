from deepchem_tpu.molnet.loader import (_MolnetLoader, TransformerGenerator,
                                        featurizers, splitters, transformers)
from deepchem_tpu.molnet.check_availability import (CheckFeaturizer,
                                                    CheckSplit)
from deepchem_tpu.molnet.dnasim import (
    simulate_single_motif_detection, simulate_motif_counting,
    simulate_motif_density_localization, simulate_multi_motif_embedding,
    simulate_differential_accessibility, simulate_heterodimer_grammar,
    simple_motif_embedding, motif_density, register_motif)
from deepchem_tpu.molnet.load_function import (
    load_tox21, load_delaney, load_freesolv, load_sampl, load_lipo,
    load_bace_classification, load_bace_regression, load_bbbp,
    load_clintox, load_hiv, load_sider, load_muv, load_qm7, load_qm8,
    load_qm9, load_thermosol, load_hppb, load_clearance, load_chembl,
    load_bandgap, load_perovskite, load_mp_formation_energy,
    load_mp_metallicity, load_toxcast, load_pcba, load_nci, load_ppb,
    load_sweetlead, load_chembl25, load_hopv, load_kaggle, load_factors,
    load_kinase, load_uv, load_zinc15, load_uspto, load_pdbbind,
    load_membrane_permeability, load_flash_points,
    load_bbbc001, load_bbbc002, load_bbbc003, load_bbbc004,
    load_bbbc005, load_cell_counting, load_Platinum_Adsorption)

__all__ = [
    '_MolnetLoader', 'TransformerGenerator', 'featurizers', 'splitters',
    'transformers', 'load_tox21', 'load_delaney', 'load_freesolv',
    'load_sampl', 'load_lipo', 'load_bace_classification',
    'load_bace_regression', 'load_bbbp', 'load_clintox', 'load_hiv',
    'load_sider', 'load_muv', 'load_qm7', 'load_qm8', 'load_qm9',
    'load_thermosol', 'load_hppb', 'load_clearance', 'load_chembl',
    'load_bandgap', 'load_perovskite', 'load_mp_formation_energy',
    'load_mp_metallicity', 'CheckFeaturizer', 'CheckSplit',
    'load_toxcast', 'load_pcba', 'load_nci', 'load_ppb', 'load_sweetlead',
    'load_sweet',
    'load_chembl25', 'load_hopv', 'load_kaggle', 'load_factors',
    'load_kinase', 'load_uv', 'load_zinc15', 'load_uspto', 'load_pdbbind',
    'load_membrane_permeability', 'load_flash_points',
    'load_bbbc001', 'load_bbbc002', 'load_bbbc003', 'load_bbbc004',
    'load_bbbc005', 'load_cell_counting', 'load_Platinum_Adsorption',
    'simulate_single_motif_detection', 'simulate_motif_counting',
    'simulate_motif_density_localization', 'simulate_multi_motif_embedding',
    'simulate_differential_accessibility', 'simulate_heterodimer_grammar',
    'simple_motif_embedding', 'motif_density', 'register_motif',
]

# reference molnet/__init__.py exports the sweetlead loader as load_sweet
load_sweet = load_sweetlead
