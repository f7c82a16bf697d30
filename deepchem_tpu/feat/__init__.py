from deepchem_tpu.feat.base import (Featurizer, MolecularFeaturizer,
                                    ComplexFeaturizer, UserDefinedFeaturizer,
                                    DummyFeaturizer, RawFeaturizer)
from deepchem_tpu.feat.graph_data import (GraphData, BatchGraphData,
                                          WeightedDirectedGraphData,
                                          pad_graph_batch, bucket_caps,
                                          graphs_to_padded_batch)
from deepchem_tpu.feat.molecule_featurizers import (
    CircularFingerprint, MACCSKeysFingerprint, PubChemFingerprint,
    Mol2VecFingerprint, MordredDescriptors, RDKitDescriptors,
    ConvMolFeaturizer, MolGraphConvFeaturizer, PagtnMolGraphFeaturizer,
    WeaveFeaturizer, OneHotFeaturizer, SmilesToSeq, SmilesToImage,
    CoulombMatrix, CoulombMatrixEig, AtomicCoordinates, create_char_to_idx,
    BPSymmetryFunctionInput, SNAPFeaturizer, DMPNNFeaturizer)
from deepchem_tpu.feat.tokenizers import (BasicSmilesTokenizer,
                                           SmilesTokenizer,
                                           HuggingFaceFeaturizer,
                                           BertFeaturizer,
                                           RobertaFeaturizer,
                                           RxnFeaturizer,
                                           VocabularyBuilder,
                                           HuggingFaceVocabularyBuilder)
from deepchem_tpu.feat.molgan_featurizer import (GraphMatrix,
                                                 MolGanFeaturizer)
from deepchem_tpu.feat.material_featurizers import (
    ElementPropertyFingerprint, ElemNetFeaturizer, SineCoulombMatrix,
    PositionFrequencyMatrix, SparseMatrixOneHotFeaturizer,
    parse_composition)
from deepchem_tpu.feat.crystal_featurizers import (CGCNNFeaturizer,
                                                   LCNNFeaturizer,
                                                   periodic_neighbors)
from deepchem_tpu.feat.bio_seq_featurizer import (SAMFeaturizer,
                                                  BAMFeaturizer,
                                                  CRAMFeaturizer)
from deepchem_tpu.feat.deepvariant import (Read, Realigner,
                                           RealignerFeaturizer,
                                           PileupFeaturizer)
from deepchem_tpu.feat.complex_featurizers import (
    ContactCircularFingerprint, ContactCircularVoxelizer,
    SplifFingerprint, SplifVoxelizer, RdkitGridFeaturizer,
    ChargeVoxelizer, SaltBridgeVoxelizer, CationPiVoxelizer,
    PiStackVoxelizer, HydrogenBondCounter, HydrogenBondVoxelizer,
    NeighborListAtomicCoordinates,
    NeighborListComplexAtomicCoordinates, BindingPocketFeaturizer)
from deepchem_tpu.feat.atomic_conformation import (
    AtomicConformation, AtomicConformationFeaturizer)
from deepchem_tpu.feat.conformer_featurizers import (
    RDKitConformerFeaturizer, EquivariantGraphFeaturizer)
from deepchem_tpu.feat.polymer_featurizers import PolyWDGFeaturizer
from deepchem_tpu.feat.base import (MaterialCompositionFeaturizer,
                                    MaterialStructureFeaturizer,
                                    PolymerFeaturizer)
from deepchem_tpu.feat import feature_utils

__all__ = [
    'Featurizer', 'MolecularFeaturizer', 'ComplexFeaturizer',
    'UserDefinedFeaturizer', 'DummyFeaturizer', 'RawFeaturizer',
    'GraphData', 'BatchGraphData', 'WeightedDirectedGraphData',
    'pad_graph_batch', 'bucket_caps', 'graphs_to_padded_batch',
    'CircularFingerprint', 'MACCSKeysFingerprint', 'PubChemFingerprint',
    'Mol2VecFingerprint', 'MordredDescriptors', 'RDKitDescriptors',
    'ConvMolFeaturizer', 'MolGraphConvFeaturizer', 'PagtnMolGraphFeaturizer',
    'WeaveFeaturizer', 'OneHotFeaturizer', 'SmilesToSeq', 'SmilesToImage',
    'CoulombMatrix', 'CoulombMatrixEig', 'AtomicCoordinates',
    'create_char_to_idx', 'feature_utils', 'BasicSmilesTokenizer',
    'SmilesTokenizer', 'HuggingFaceFeaturizer', 'BertFeaturizer',
    'RobertaFeaturizer', 'RxnFeaturizer', 'GraphMatrix',
    'MolGanFeaturizer', 'ElementPropertyFingerprint', 'ElemNetFeaturizer',
    'SineCoulombMatrix', 'PositionFrequencyMatrix',
    'SparseMatrixOneHotFeaturizer', 'parse_composition',
    'CGCNNFeaturizer', 'LCNNFeaturizer', 'periodic_neighbors',
    'SAMFeaturizer', 'BAMFeaturizer', 'CRAMFeaturizer',
    'BPSymmetryFunctionInput', 'SNAPFeaturizer',
    'Read', 'Realigner', 'RealignerFeaturizer', 'PileupFeaturizer',
    'ContactCircularFingerprint', 'ContactCircularVoxelizer',
    'SplifFingerprint', 'SplifVoxelizer', 'RdkitGridFeaturizer',
    'RDKitConformerFeaturizer', 'EquivariantGraphFeaturizer',
    'PolyWDGFeaturizer', 'PolymerFeaturizer',
    'MaterialCompositionFeaturizer', 'MaterialStructureFeaturizer',
    'ChargeVoxelizer', 'SaltBridgeVoxelizer', 'CationPiVoxelizer',
    'PiStackVoxelizer', 'HydrogenBondCounter', 'HydrogenBondVoxelizer',
    'NeighborListAtomicCoordinates',
    'NeighborListComplexAtomicCoordinates', 'BindingPocketFeaturizer',
    'AtomicConformation', 'AtomicConformationFeaturizer',
    'DMPNNFeaturizer', 'VocabularyBuilder',
    'HuggingFaceVocabularyBuilder',
    # lazily resolved from their model modules (see __getattr__)
    'AtomicConvFeaturizer',
    'ComplexNeighborListFragmentAtomicCoordinates', 'MATFeaturizer',
    'MXMNetFeaturizer', 'GroverFeaturizer',
    'GroverAtomVocabularyBuilder', 'GroverBondVocabularyBuilder',
    'GroverAtomVocabTokenizer', 'GroverBondVocabTokenizer',
]

# Featurizers that live next to their models (the reference keeps them
# under feat/): resolved lazily to avoid a feat <-> models import cycle.
_MODEL_FEATURIZERS = {
    'AtomicConvFeaturizer': 'deepchem_tpu.models.atomic_conv',
    'ComplexNeighborListFragmentAtomicCoordinates':
        'deepchem_tpu.models.atomic_conv',
    'MATFeaturizer': 'deepchem_tpu.models.mat',
    'MXMNetFeaturizer': 'deepchem_tpu.models.mxmnet',
    'GroverFeaturizer': 'deepchem_tpu.models.grover',
    # reference feat/vocabulary_builders/__init__.py:1-5
    'GroverAtomVocabularyBuilder': 'deepchem_tpu.feat.vocabulary_builders',
    'GroverBondVocabularyBuilder': 'deepchem_tpu.feat.vocabulary_builders',
    'GroverAtomVocabTokenizer': 'deepchem_tpu.feat.vocabulary_builders',
    'GroverBondVocabTokenizer': 'deepchem_tpu.feat.vocabulary_builders',
}


def __getattr__(name):
    mod = _MODEL_FEATURIZERS.get(name)
    if mod is None:
        raise AttributeError(
            f'module {__name__!r} has no attribute {name!r}')
    import importlib
    return getattr(importlib.import_module(mod), name)
