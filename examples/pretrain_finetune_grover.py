"""GROVER self-supervised pretraining then fine-tuning."""
import numpy as np
import deepchem_tpu as dc
from deepchem_tpu.chem import mol_from_smiles
from deepchem_tpu.models import (GroverModel, GroverFeaturizer,
                                 GroverAtomVocabularyBuilder,
                                 GroverBondVocabularyBuilder)

tasks, (train, valid, test), transformers = dc.molnet.load_delaney(
    featurizer='raw', splitter='random')
smiles = [str(s) for s in train.ids]
mols = [mol_from_smiles(s) for s in smiles]

atom_vocab = GroverAtomVocabularyBuilder()
atom_vocab.build(mols)
bond_vocab = GroverBondVocabularyBuilder()
bond_vocab.build(mols)

feat = GroverFeaturizer(atom_vocab=atom_vocab, bond_vocab=bond_vocab)
X = feat.featurize(smiles)
from deepchem_tpu.data import NumpyDataset
ds = NumpyDataset(X, np.zeros((len(X), 1)))

pre = GroverModel(task='pretraining', atom_vocab=atom_vocab,
                  bond_vocab=bond_vocab, batch_size=32)
pre.fit(ds, nb_epoch=10, checkpoint_interval=0)
pre.save_components()
print('pretraining done; encoder saved to', pre.model_dir)
