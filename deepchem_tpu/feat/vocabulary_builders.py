"""Vocabulary builders under the reference's feat namespace.

Mirrors ``deepchem/feat/vocabulary_builders/__init__.py:1-5``: the Grover
atom/bond vocabulary builders (reference
``feat/vocabulary_builders/grover_vocab.py``) plus the HuggingFace
vocabulary builder.  The Grover builders themselves live with the Grover
model (``deepchem_tpu/models/grover.py``) because the model's masked
pretraining tasks share their context encoding; this module gives them
their reference import path and adds the two tokenizer featurizers.
"""

from __future__ import annotations

from typing import Any, Tuple

from deepchem_tpu.feat.base import Featurizer
from deepchem_tpu.feat.tokenizers import HuggingFaceVocabularyBuilder
from deepchem_tpu.models.grover import (GroverAtomVocabularyBuilder,
                                        GroverBondVocabularyBuilder)

__all__ = [
    'GroverAtomVocabularyBuilder', 'GroverBondVocabularyBuilder',
    'GroverAtomVocabTokenizer', 'GroverBondVocabTokenizer',
    'HuggingFaceVocabularyBuilder',
]


class GroverAtomVocabTokenizer(Featurizer):
    """Tokenize ``(mol, atom)`` pairs with a saved Grover atom
    vocabulary (reference grover_vocab.py:513).

    Examples
    --------
    >>> import tempfile
    >>> from deepchem_tpu.chem import mol_from_smiles
    >>> vocab = GroverAtomVocabularyBuilder()
    >>> mol = mol_from_smiles('CC(=O)C')
    >>> vocab.build([mol])
    >>> with tempfile.NamedTemporaryFile(suffix='.json') as f:
    ...     vocab.save(f.name)
    ...     tok = GroverAtomVocabTokenizer(f.name)
    >>> int(tok.featurize([(mol, mol.atoms[0])])[0]) > 0
    True
    """

    def __init__(self, fname: str):
        self.vocabulary = GroverAtomVocabularyBuilder.load(fname)

    def _featurize(self, datapoint: Tuple[Any, Any], **kwargs) -> int:
        mol, atom = datapoint
        return self.vocabulary.encode(mol, atom)


class GroverBondVocabTokenizer(Featurizer):
    """Tokenize ``(mol, bond)`` pairs with a saved Grover bond
    vocabulary (reference grover_vocab.py:547).

    Examples
    --------
    >>> import tempfile
    >>> from deepchem_tpu.chem import mol_from_smiles
    >>> vocab = GroverBondVocabularyBuilder()
    >>> mol = mol_from_smiles('CC(=O)C')
    >>> vocab.build([mol])
    >>> with tempfile.NamedTemporaryFile(suffix='.json') as f:
    ...     vocab.save(f.name)
    ...     tok = GroverBondVocabTokenizer(f.name)
    >>> int(tok.featurize([(mol, mol.bonds[0])])[0]) > 0
    True
    """

    def __init__(self, fname: str):
        self.vocabulary = GroverBondVocabularyBuilder.load(fname)

    def _featurize(self, datapoint: Tuple[Any, Any], **kwargs) -> int:
        mol, bond = datapoint
        return self.vocabulary.encode_bond(mol, bond)
