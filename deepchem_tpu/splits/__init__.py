from deepchem_tpu.splits.splitters import (
    Splitter, RandomSplitter, IndexSplitter, SpecifiedSplitter,
    RandomGroupSplitter, RandomStratifiedSplitter,
    SingletaskStratifiedSplitter, MolecularWeightSplitter, ScaffoldSplitter,
    FingerprintSplitter, ButinaSplitter, MaxMinSplitter, TaskSplitter,
    generate_scaffold, butina_cluster, TimeSplitter, TimeSplitterPDBbind,
    merge_fold_datasets)

__all__ = [
    'Splitter', 'RandomSplitter', 'IndexSplitter', 'SpecifiedSplitter',
    'RandomGroupSplitter', 'RandomStratifiedSplitter',
    'SingletaskStratifiedSplitter', 'MolecularWeightSplitter',
    'ScaffoldSplitter', 'FingerprintSplitter', 'ButinaSplitter',
    'MaxMinSplitter', 'TaskSplitter', 'generate_scaffold', 'butina_cluster',
    'TimeSplitter', 'TimeSplitterPDBbind', 'merge_fold_datasets',
]
