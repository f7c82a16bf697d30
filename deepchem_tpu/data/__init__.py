from deepchem_tpu.data.datasets import (Dataset, NumpyDataset, DiskDataset,
                                        ImageDataset, Databag, pad_batch, pad_features,
                                        sparsify_features, densify_features)
from deepchem_tpu.data.loaders import (DataLoader, CSVLoader, UserCSVLoader,
                                       JsonLoader, SDFLoader, FASTALoader,
                                       DFTYamlLoader,
                                       FASTQLoader, ImageLoader,
                                       InMemoryLoader, SAMLoader,
                                       BAMLoader, CRAMLoader)
from deepchem_tpu.data.supports import (remove_dead_examples,
                                        get_task_dataset,
                                        get_single_task_test,
                                        get_task_support,
                                        SupportGenerator, EpisodeGenerator)

__all__ = [
    'Dataset', 'NumpyDataset', 'DiskDataset', 'ImageDataset', 'Databag',
    'pad_batch', 'pad_features', 'sparsify_features', 'densify_features',
    'DataLoader', 'CSVLoader', 'UserCSVLoader', 'JsonLoader', 'SDFLoader',
    'FASTALoader', 'FASTQLoader', 'ImageLoader', 'InMemoryLoader',
    'DFTYamlLoader', 'SAMLoader', 'BAMLoader', 'CRAMLoader',
]
