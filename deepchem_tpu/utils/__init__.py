from deepchem_tpu.utils.data_utils import (
    get_data_dir, download_url, save_to_disk, load_from_disk,
    save_dataset_to_disk, load_dataset_from_disk, save_transformers,
    load_transformers, pad_array, untargz_file, unzip_file)

__all__ = [
    'get_data_dir', 'download_url', 'save_to_disk', 'load_from_disk',
    'save_dataset_to_disk', 'load_dataset_from_disk', 'save_transformers',
    'load_transformers', 'pad_array', 'untargz_file', 'unzip_file',
]
