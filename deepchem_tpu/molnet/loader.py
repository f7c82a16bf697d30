"""MoleculeNet loader pipeline.

Redesign of reference deepchem/molnet/load_function/molnet_loader.py:13-138:
``TransformerGenerator`` + ``_MolnetLoader`` with the featurized-dataset cache
(save_dir/<name>-featurized/<featurizer>/<splitter>), named
featurizer/splitter/transformer registries, and the create -> split ->
fit-transformers-on-train -> transform-all -> persist flow.  Data comes from
the DeepChem S3 bucket with a local-mirror fallback (zero-egress builds).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

import deepchem_tpu.feat as feat
import deepchem_tpu.splits as splits
import deepchem_tpu.trans as trans
from deepchem_tpu.data import Dataset, DiskDataset
from deepchem_tpu.utils.data_utils import (download_url, get_data_dir,
                                           load_dataset_from_disk,
                                           save_dataset_to_disk)

logger = logging.getLogger(__name__)

DEEPCHEM_S3 = 'https://deepchemdata.s3-us-west-1.amazonaws.com/datasets/'


class TransformerGenerator:
    """Defer transformer construction until the dataset exists (reference
    molnet_loader.py:13)."""

    def __init__(self, transformer_class, **kwargs):
        self.transformer_class = transformer_class
        self.kwargs = kwargs

    def create_transformer(self, dataset: Dataset):
        return self.transformer_class(dataset=dataset, **self.kwargs)

    def get_directory_name(self) -> str:
        name = self.transformer_class.__name__.lower()
        name = name.replace('transformer', '')
        for k, v in sorted(self.kwargs.items()):
            if k == 'dataset':
                continue
            name += f'_{k}_{v}'
        return name


featurizers: Dict[str, 'feat.Featurizer'] = {}
splitters: Dict[str, 'splits.Splitter'] = {}
transformers: Dict[str, TransformerGenerator] = {}


def _register_defaults():
    """Named presets (reference molnet_loader.py:49-80)."""
    featurizers.update({
        'ecfp': feat.CircularFingerprint(size=1024),
        'maccs': feat.MACCSKeysFingerprint(),
        'graphconv': feat.ConvMolFeaturizer(),
        'weave': feat.WeaveFeaturizer(),
        'raw': feat.RawFeaturizer(),
        'smiles2seq': feat.RawFeaturizer(smiles=True),
        'smiles2img': feat.SmilesToImage(img_size=80, img_spec='engd'),
        'onehot': feat.OneHotFeaturizer(),
        'rdkit-descriptors': feat.RDKitDescriptors(),
        'graph': feat.MolGraphConvFeaturizer(),
        'graph-edges': feat.MolGraphConvFeaturizer(use_edges=True),
    })
    splitters.update({
        'index': splits.IndexSplitter(),
        'random': splits.RandomSplitter(),
        'scaffold': splits.ScaffoldSplitter(),
        'butina': splits.ButinaSplitter(),
        'fingerprint': splits.FingerprintSplitter(),
        'stratified': splits.RandomStratifiedSplitter(),
    })
    transformers.update({
        'balancing': TransformerGenerator(trans.BalancingTransformer),
        'normalization': TransformerGenerator(
            trans.NormalizationTransformer, transform_y=True),
        'minmax': TransformerGenerator(
            trans.MinMaxTransformer, transform_y=True),
        'clipping': TransformerGenerator(
            trans.ClippingTransformer, transform_X=True),
        'log': TransformerGenerator(
            trans.LogTransformer, transform_y=True),
    })


_register_defaults()


class _MolnetLoader:
    """One dataset loader (reference molnet_loader.py:83)."""

    def __init__(self, featurizer: Union[str, 'feat.Featurizer'],
                 splitter: Union[str, 'splits.Splitter', None],
                 transformer_generators: Sequence[
                     Union[str, TransformerGenerator]],
                 tasks: Sequence[str],
                 data_dir: Optional[str],
                 save_dir: Optional[str], **kwargs):
        if data_dir is None:
            data_dir = get_data_dir()
        if save_dir is None:
            save_dir = get_data_dir()
        self.data_dir = data_dir
        self.save_dir = save_dir
        if isinstance(featurizer, str):
            featurizer = featurizers[featurizer.lower()]
        if isinstance(splitter, str):
            splitter = splitters[splitter.lower()]
        self.featurizer = featurizer
        self.splitter = splitter
        self.transformers = [
            transformers[t.lower()] if isinstance(t, str) else t
            for t in transformer_generators]
        self.tasks = list(tasks)
        self.args = kwargs

    def load_dataset(self, name: str, reload: bool
                     ) -> Tuple[List[str], Tuple[Dataset, ...], List]:
        """(reference molnet_loader.py:138)"""
        if self.splitter is None:
            save_folder = None
        else:
            featurizer_name = _dirname(self.featurizer)
            splitter_name = _dirname(self.splitter)
            # a seeded split is a DIFFERENT split — key the cache on it,
            # or a reload would silently return another seed's split
            sseed = self.args.get('splitter_seed')
            if sseed is not None:
                splitter_name = f'{splitter_name}-seed{sseed}'
            save_folder = os.path.join(
                self.save_dir, f'{name}-featurized', featurizer_name,
                splitter_name)
            if self.transformers:
                transformer_name = '_'.join(
                    t.get_directory_name() for t in self.transformers)
                save_folder = os.path.join(save_folder, transformer_name)
        if reload and save_folder is not None:
            found, all_dataset, transformers_loaded = \
                load_dataset_from_disk(save_folder)
            if found:
                return self.tasks, all_dataset, transformers_loaded
        logger.info('About to featurize %s dataset.', name)
        dataset = self.create_dataset()
        if self.splitter is None:
            transformers_applied = [
                t.create_transformer(dataset) for t in self.transformers]
            for t in transformers_applied:
                dataset = t.transform(dataset)
            return self.tasks, (dataset,), transformers_applied
        logger.info('About to split dataset with %s splitter.',
                    _dirname(self.splitter))
        # splitter_seed (reference run_benchmark.py:32 seed=123 protocol)
        # pins the split so benchmark runs are reproducible — and the
        # derived graph-padding caps are stable, which keeps the epoch
        # scan's HLO identical run-to-run for the persistent compile
        # cache (an unseeded split varies the caps and misses)
        seed = self.args.get('splitter_seed')
        train, valid, test = self.splitter.train_valid_test_split(
            dataset, **({} if seed is None else {'seed': seed}))
        transformers_applied = [
            t.create_transformer(train) for t in self.transformers]
        for t in transformers_applied:
            train = t.transform(train)
            valid = t.transform(valid)
            test = t.transform(test)
        if save_folder is not None and isinstance(train, DiskDataset):
            save_dataset_to_disk(save_folder, train, valid, test,
                                 transformers_applied)
        return self.tasks, (train, valid, test), transformers_applied

    def create_dataset(self) -> Dataset:
        raise NotImplementedError


def _dirname(obj) -> str:
    return type(obj).__name__.lower()
