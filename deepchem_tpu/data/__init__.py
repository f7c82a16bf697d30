from deepchem_tpu.data.datasets import (Dataset, NumpyDataset, DiskDataset,
                                        ImageDataset, Databag, pad_batch,
                                        sparsify_features, densify_features)
from deepchem_tpu.data.loaders import (DataLoader, CSVLoader, UserCSVLoader,
                                       JsonLoader, SDFLoader, FASTALoader,
                                       FASTQLoader, ImageLoader,
                                       InMemoryLoader)

__all__ = [
    'Dataset', 'NumpyDataset', 'DiskDataset', 'ImageDataset', 'Databag',
    'pad_batch', 'sparsify_features', 'densify_features',
    'DataLoader', 'CSVLoader', 'UserCSVLoader', 'JsonLoader', 'SDFLoader',
    'FASTALoader', 'FASTQLoader', 'ImageLoader', 'InMemoryLoader',
]
