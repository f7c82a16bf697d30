from deepchem_tpu.utils import (batch_utils, debug_utils, geometry_utils,
                                hash_utils, voxel_utils, genomics_utils,
                                pdbqt_utils, fragment_utils,
                                equivariance_utils, safeops_utils,
                                periodic_table_utils, sequence_utils,
                                cache_utils, noncovalent_utils, profiling)
from deepchem_tpu.utils.conformers import (ConformerGenerator,
                                           embed_molecule_3d)
from deepchem_tpu.utils.fake_data_generator import FakeGraphGenerator
from deepchem_tpu.utils.electron_sampler import ElectronSampler
from deepchem_tpu.utils.data_utils import (
    get_data_dir, download_url, save_to_disk, load_from_disk,
    save_dataset_to_disk, load_dataset_from_disk, save_transformers,
    load_transformers, pad_array, untargz_file, unzip_file)

__all__ = [
    'get_data_dir', 'download_url', 'save_to_disk', 'load_from_disk',
    'save_dataset_to_disk', 'load_dataset_from_disk', 'save_transformers',
    'load_transformers', 'pad_array', 'untargz_file', 'unzip_file',
    'batch_utils', 'debug_utils', 'geometry_utils', 'hash_utils',
    'voxel_utils', 'ConformerGenerator', 'embed_molecule_3d',
    'FakeGraphGenerator', 'ElectronSampler', 'genomics_utils',
    'pdbqt_utils', 'fragment_utils', 'equivariance_utils',
    'safeops_utils', 'periodic_table_utils', 'sequence_utils',
    'cache_utils', 'noncovalent_utils', 'profiling',
]
