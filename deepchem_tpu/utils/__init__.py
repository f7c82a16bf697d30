from deepchem_tpu.utils import (batch_utils, debug_utils, geometry_utils,
                                hash_utils, voxel_utils, genomics_utils,
                                pdbqt_utils, fragment_utils,
                                equivariance_utils, safeops_utils,
                                periodic_table_utils, sequence_utils,
                                cache_utils, noncovalent_utils, profiling,
                                misc_utils, attribute_utils,
                                docking_utils, coordinate_box_utils)
from deepchem_tpu.utils.conformers import (ConformerGenerator,
                                           embed_molecule_3d)
from deepchem_tpu.utils.fake_data_generator import FakeGraphGenerator
from deepchem_tpu.utils.electron_sampler import ElectronSampler
from deepchem_tpu.utils.data_utils import (
    get_data_dir, download_url, save_to_disk, load_from_disk,
    save_dataset_to_disk, load_dataset_from_disk, save_transformers,
    load_transformers, pad_array, untargz_file, unzip_file,
    load_csv_files, load_json_files, load_sdf_files, load_image_files,
    load_pickle_files, load_data, remove_missing_entries)

# ---------------------------------------------------------------------------
# Flat re-exports (reference deepchem/utils/__init__.py star-imports every
# utils submodule — dc.utils.CoordinateBox etc. is the public spelling).
# ---------------------------------------------------------------------------
from deepchem_tpu.utils.evaluate import (Evaluator, GeneratorEvaluator,
                                         relative_difference)
from deepchem_tpu.utils.fragment_utils import (
    AtomShim, MolecularFragment, get_partial_charge,
    get_contact_atom_indices, reduce_molecular_complex_to_contacts,
    strip_hydrogens, get_mol_subset, merge_molecular_fragments)
from deepchem_tpu.utils.geometry_utils import (
    angle_between, compute_centroid, compute_pairwise_distances,
    compute_protein_range, generate_random_rotation_matrix,
    generate_random_unit_vector, is_angle_within_cutoff,
    subtract_centroid, unit_vector)
from deepchem_tpu.utils.coordinate_box_utils import (
    CoordinateBox, merge_overlapping_boxes, intersect_interval,
    intersection, union, get_face_boxes)
from deepchem_tpu.utils.voxel_utils import (convert_atom_to_voxel,
                                            convert_atom_pair_to_voxel,
                                            voxelize)
from deepchem_tpu.utils.hash_utils import (hash_ecfp, hash_ecfp_pair,
                                           vectorize)
from deepchem_tpu.utils.misc_utils import (
    indent, shape2str, UnimplementedError, GetSetParamsError,
    ConvergenceWarning, MathWarning, Uniquifier, memoize_method,
    get_option, chunkify, get_memory, get_dtype_memsize, get_np_dtype,
    gaussian_integral, TensorNonTensorSeparator, tallqr,
    to_fortran_order, unsorted_segment_sum, unsorted_segment_max,
    estimate_ovlp_rcut, UniversalNamedTemporaryFile)
from deepchem_tpu.utils.attribute_utils import get_attr, set_attr, del_attr
from deepchem_tpu.utils.safeops_utils import (safepow, safenorm,
                                              occnumber,
                                              get_floor_and_ceil,
                                              safe_cdist)
from deepchem_tpu.utils.periodic_table_utils import (get_atomz,
                                                     get_atom_mass,
                                                     get_period)
from deepchem_tpu.utils.debug_utils import (get_print_threshold,
                                            set_print_threshold,
                                            get_max_print_size,
                                            set_max_print_size)
from deepchem_tpu.utils.genomics_utils import (encode_bio_sequence,
                                               seq_one_hot_encode)
from deepchem_tpu.utils.sequence_utils import hhblits, hhsearch
from deepchem_tpu.utils.pdbqt_utils import (pdbqt_to_pdb,
                                            convert_mol_to_pdbqt,
                                            convert_protein_to_pdbqt)
from deepchem_tpu.utils.docking_utils import (write_vina_conf,
                                              write_gnina_conf,
                                              read_gnina_log,
                                              load_docked_ligands,
                                              prepare_inputs)
from deepchem_tpu.utils.batch_utils import batch_coulomb_matrix_features
from deepchem_tpu.utils.poly_wd_graph_utils import (
    PolyWDGStringValidator, handle_hydrogen, make_polymer_mol,
    onek_encoding_unk, parse_polymer_rules, tag_atoms_in_repeating_unit,
    remove_wildcard_atoms)
# atom/bond one-hot helpers (reference utils/molecule_feature_utils.py;
# here they live beside the featurizers in feat/feature_utils.py)
from deepchem_tpu.feat.feature_utils import (
    one_hot_encode, construct_hydrogen_bonding_info,
    get_atom_type_one_hot, get_atom_formal_charge,
    get_atom_formal_charge_one_hot, get_atom_hybridization_one_hot,
    get_atom_hydrogen_bonding_one_hot, get_atom_is_in_aromatic_one_hot,
    get_atom_partial_charge, get_atom_total_degree_one_hot,
    get_atom_total_num_Hs_one_hot, get_atom_chirality_one_hot,
    get_bond_type_one_hot, get_bond_is_conjugated_one_hot,
    get_bond_is_in_same_ring_one_hot, get_bond_stereo_one_hot,
    get_bond_graph_distance_one_hot)

__all__ = [
    'get_data_dir', 'download_url', 'save_to_disk', 'load_from_disk',
    'save_dataset_to_disk', 'load_dataset_from_disk', 'save_transformers',
    'load_transformers', 'pad_array', 'untargz_file', 'unzip_file',
    'load_csv_files', 'load_json_files', 'load_sdf_files',
    'load_image_files', 'load_pickle_files', 'load_data',
    'remove_missing_entries',
    'batch_utils', 'debug_utils', 'geometry_utils', 'hash_utils',
    'voxel_utils', 'ConformerGenerator', 'embed_molecule_3d',
    'FakeGraphGenerator', 'ElectronSampler', 'genomics_utils',
    'pdbqt_utils', 'fragment_utils', 'equivariance_utils',
    'safeops_utils', 'periodic_table_utils', 'sequence_utils',
    'cache_utils', 'noncovalent_utils', 'profiling', 'misc_utils',
    'attribute_utils', 'docking_utils', 'coordinate_box_utils',
    'Evaluator', 'GeneratorEvaluator', 'relative_difference',
    'AtomShim', 'MolecularFragment', 'get_partial_charge',
    'get_contact_atom_indices', 'reduce_molecular_complex_to_contacts',
    'strip_hydrogens', 'get_mol_subset', 'merge_molecular_fragments',
    'angle_between', 'compute_centroid', 'compute_pairwise_distances',
    'compute_protein_range', 'generate_random_rotation_matrix',
    'generate_random_unit_vector', 'is_angle_within_cutoff',
    'subtract_centroid', 'unit_vector',
    'CoordinateBox', 'merge_overlapping_boxes', 'intersect_interval',
    'intersection', 'union', 'get_face_boxes',
    'convert_atom_to_voxel', 'convert_atom_pair_to_voxel', 'voxelize',
    'hash_ecfp', 'hash_ecfp_pair', 'vectorize',
    'indent', 'shape2str', 'UnimplementedError', 'GetSetParamsError',
    'ConvergenceWarning', 'MathWarning', 'Uniquifier', 'memoize_method',
    'get_option', 'chunkify', 'get_memory', 'get_dtype_memsize',
    'get_np_dtype', 'gaussian_integral', 'TensorNonTensorSeparator',
    'tallqr', 'to_fortran_order', 'unsorted_segment_sum',
    'unsorted_segment_max', 'estimate_ovlp_rcut',
    'UniversalNamedTemporaryFile',
    'get_attr', 'set_attr', 'del_attr',
    'safepow', 'safenorm', 'occnumber', 'get_floor_and_ceil',
    'safe_cdist',
    'get_atomz', 'get_atom_mass', 'get_period',
    'get_print_threshold', 'set_print_threshold', 'get_max_print_size',
    'set_max_print_size',
    'encode_bio_sequence', 'seq_one_hot_encode', 'hhblits', 'hhsearch',
    'pdbqt_to_pdb', 'convert_mol_to_pdbqt', 'convert_protein_to_pdbqt',
    'write_vina_conf', 'write_gnina_conf', 'read_gnina_log',
    'load_docked_ligands', 'prepare_inputs',
    'batch_coulomb_matrix_features',
    'PolyWDGStringValidator', 'handle_hydrogen', 'make_polymer_mol',
    'onek_encoding_unk', 'parse_polymer_rules',
    'tag_atoms_in_repeating_unit', 'remove_wildcard_atoms',
    'one_hot_encode', 'construct_hydrogen_bonding_info',
    'get_atom_type_one_hot', 'get_atom_formal_charge',
    'get_atom_formal_charge_one_hot', 'get_atom_hybridization_one_hot',
    'get_atom_hydrogen_bonding_one_hot',
    'get_atom_is_in_aromatic_one_hot', 'get_atom_partial_charge',
    'get_atom_total_degree_one_hot', 'get_atom_total_num_Hs_one_hot',
    'get_atom_chirality_one_hot', 'get_bond_type_one_hot',
    'get_bond_is_conjugated_one_hot', 'get_bond_is_in_same_ring_one_hot',
    'get_bond_stereo_one_hot', 'get_bond_graph_distance_one_hot',
    # lazily resolved (live beside their models; see __getattr__)
    'fourier_encode_dist', 'aggregate_mean', 'aggregate_max',
    'aggregate_min', 'aggregate_std', 'aggregate_sum', 'aggregate_var',
    'aggregate_moment', 'scale_identity', 'scale_amplification',
    'scale_attenuation', 'segment_sum',
]

# Graph helpers that live beside their models (reference keeps them in
# utils/graph_utils.py + pytorch_utils.py): resolved lazily to avoid a
# utils <-> models import cycle.
_MODEL_HOSTED = {
    'fourier_encode_dist': 'deepchem_tpu.models.gnn3d',
    'aggregate_mean': 'deepchem_tpu.models.pna',
    'aggregate_max': 'deepchem_tpu.models.pna',
    'aggregate_min': 'deepchem_tpu.models.pna',
    'aggregate_std': 'deepchem_tpu.models.pna',
    'aggregate_sum': 'deepchem_tpu.models.pna',
    'aggregate_var': 'deepchem_tpu.models.pna',
    'aggregate_moment': 'deepchem_tpu.models.pna',
    'scale_identity': 'deepchem_tpu.models.pna',
    'scale_amplification': 'deepchem_tpu.models.pna',
    'scale_attenuation': 'deepchem_tpu.models.pna',
    'segment_sum': 'deepchem_tpu.models.dag',
}


def __getattr__(name):
    mod = _MODEL_HOSTED.get(name)
    if mod is None:
        raise AttributeError(
            f'module {__name__!r} has no attribute {name!r}')
    import importlib
    return getattr(importlib.import_module(mod), name)
