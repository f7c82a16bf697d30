from deepchem_tpu.models.base import Model
from deepchem_tpu.models.jax_model import JaxModel
from deepchem_tpu.models import losses
from deepchem_tpu.models import optimizers
from deepchem_tpu.models.losses import (
    Loss, L1Loss, L2Loss, HuberLoss, HingeLoss, SquaredHingeLoss,
    PoissonLoss, BinaryCrossEntropy, CategoricalCrossEntropy,
    SigmoidCrossEntropy, SoftmaxCrossEntropy, SparseSoftmaxCrossEntropy,
    VAE_ELBO, VAE_KLDivergence, ShannonEntropy,
    GlobalMutualInformationLoss, LocalMutualInformationLoss,
    GroverPretrainLoss, EdgePredictionLoss, GraphNodeMaskingLoss,
    GraphEdgeMaskingLoss, DeepGraphInfomaxLoss, GraphContextPredLoss,
    DensityProfileLoss, NTXentMultiplePositives)
from deepchem_tpu.models.optimizers import (
    Optimizer, LearningRateSchedule, Adam, AdamW, SparseAdam, AdaGrad,
    RMSProp, GradientDescent, Lamb, KFAC, ExponentialDecay,
    PolynomialDecay, LinearCosineDecay, PiecewiseConstantSchedule,
    LambdaLRWithWarmup)
from deepchem_tpu.models.callbacks import ValidationCallback
from deepchem_tpu.models.fcnet import (MultitaskClassifier,
                                       MultitaskRegressor,
                                       MultitaskFitTransformRegressor,
                                       RobustMultitaskClassifier,
                                       RobustMultitaskRegressor)
from deepchem_tpu.models.sklearn_models import SklearnModel
from deepchem_tpu.models.gbdt_models import GBDTModel
from deepchem_tpu.models.graph_models import (GraphModel, GraphConvModel,
                                              GCNModel, GATModel,
                                              AttentiveFPModel, MPNNModel,
                                              PagtnModel)
from deepchem_tpu.models.weave_models import WeaveModel, DTNNModel
from deepchem_tpu.models.text_cnn import TextCNNModel
from deepchem_tpu.models.irv import MultitaskIRVClassifier
from deepchem_tpu.models.progressive import (ProgressiveMultitaskClassifier,
                                             ProgressiveMultitaskRegressor)
from deepchem_tpu.models.scscore import ScScoreModel
from deepchem_tpu.models.cnn import CNN, CNNModel
from deepchem_tpu.models.chemnet import (Smiles2Vec, Smiles2VecModel,
                                         ChemCeption, ChemCeptionModel)
from deepchem_tpu.models.seqtoseq import (SeqToSeqModel, SeqToSeq,
                                          AspuruGuzikAutoEncoder)
from deepchem_tpu.models.gan import GAN, WGAN, GANModel, WGANModel
from deepchem_tpu.models.flows import (NormalizingFlow,
                                       NormalizingFlowModel)
from deepchem_tpu.models.wandblogger import WandbLogger, TensorboardLogger
from deepchem_tpu.models.dmpnn import DMPNNModel
from deepchem_tpu.models.gnn3d import InfoMax3DModular, Net3DLayer
from deepchem_tpu.models.low_data import (AttnLSTMEmbedding,
                                          IterRefLSTMEmbedding,
                                          SupportGraphClassifier)
from deepchem_tpu.models.atomic_conv import (AtomicConvModel,
                                             AtomicConvFeaturizer)
from deepchem_tpu.models.bert_encoder import BertEncoderMLM
from deepchem_tpu.models.multitask import SingletaskToMultitask
from deepchem_tpu.models.hf_models import (HuggingFaceModel, Chemberta,
                                           MoLFormer,
                                           ProtBERT, DeepAbLLM)
from deepchem_tpu.models.oneformer import OneFormer
from deepchem_tpu.models.molgan import BasicMolGANModel
from deepchem_tpu.models.trainer import DistributedTrainer
from deepchem_tpu.models.infograph import (InfoGraphModel,
                                           InfoGraphStarModel)
from deepchem_tpu.models.material_models import (CGCNNModel, MEGNetModel,
                                                 LCNNModel, ElemNetModel)
from deepchem_tpu.models.unet import UNetModel, InceptionV3Model
from deepchem_tpu.models.gnn_modular import GNNModular, ModularModel
from deepchem_tpu.models.pna import PNAModel
from deepchem_tpu.models.mat import MATModel, MATFeaturizer
from deepchem_tpu.models.grover import (GroverModel, GroverFeaturizer,
                                        GroverAtomVocabularyBuilder,
                                        GroverBondVocabularyBuilder)
from deepchem_tpu.models.ferminet import FerminetModel
from deepchem_tpu.models.pinns import PINNModel
from deepchem_tpu.models.dag import DAGModel
from deepchem_tpu.models.mxmnet import MXMNetModel, MXMNetFeaturizer

__all__ = [
    'Model', 'JaxModel', 'losses', 'optimizers', 'ValidationCallback',
    'MultitaskClassifier', 'MultitaskRegressor',
    'MultitaskFitTransformRegressor', 'RobustMultitaskClassifier',
    'RobustMultitaskRegressor', 'SklearnModel', 'GBDTModel',
    'GraphModel', 'GraphConvModel', 'GCNModel', 'GATModel',
    'AttentiveFPModel', 'MPNNModel', 'PagtnModel', 'WeaveModel',
    'DTNNModel',
    'TextCNNModel', 'MultitaskIRVClassifier',
    'ProgressiveMultitaskClassifier', 'ProgressiveMultitaskRegressor',
    'ScScoreModel', 'CNN', 'CNNModel', 'Smiles2Vec', 'Smiles2VecModel',
    'ChemCeption', 'ChemCeptionModel', 'SeqToSeqModel', 'SeqToSeq',
    'AspuruGuzikAutoEncoder', 'GAN', 'WGAN', 'GANModel', 'WGANModel',
    'NormalizingFlow', 'NormalizingFlowModel', 'WandbLogger',
    'TensorboardLogger', 'DMPNNModel', 'AtomicConvModel',
    'AttnLSTMEmbedding', 'IterRefLSTMEmbedding', 'SupportGraphClassifier',
    'InfoMax3DModular', 'Net3DLayer',
    'AtomicConvFeaturizer', 'SingletaskToMultitask', 'BertEncoderMLM',
    'HuggingFaceModel', 'Chemberta', 'BasicMolGANModel',
    'DistributedTrainer', 'InfoGraphModel', 'InfoGraphStarModel',
    'CGCNNModel', 'MEGNetModel', 'LCNNModel', 'ElemNetModel',
    'UNetModel', 'InceptionV3Model', 'GNNModular', 'ModularModel',
    'PNAModel', 'MATModel', 'MATFeaturizer', 'GroverModel',
    'GroverFeaturizer', 'GroverAtomVocabularyBuilder',
    'GroverBondVocabularyBuilder', 'FerminetModel', 'PINNModel',
    'DAGModel', 'MXMNetModel', 'MXMNetFeaturizer',
]

# ---------------------------------------------------------------------------
# Reference-compat surface (deepchem/models/__init__.py):
# attention/readout building blocks, bare-name model aliases, and the
# legacy TensorGraph names the reference itself keeps as aliases
# ("Compatibility imports for renamed TensorGraph models",
# reference models/__init__.py:98).
# ---------------------------------------------------------------------------
from deepchem_tpu.models.attention_layers import (
    ScaledDotProductAttention, SelfAttention, GroverReadout)

# Bare-name aliases: the reference exports the raw torch nn.Modules
# (GCN, GAT, ...) alongside their TorchModel wrappers.  In this
# framework the module internals are flax classes; the public aliases
# resolve to the working model class so `from deepchem_tpu.models
# import GCN` keeps meaning "a usable GCN".
GCN = GCNModel
GAT = GATModel
AttentiveFP = AttentiveFPModel
Pagtn = PagtnModel
DMPNN = DMPNNModel
MXMNet = MXMNetModel
CGCNN = CGCNNModel
LCNN = LCNNModel

# Legacy TensorGraph compat aliases (reference models/__init__.py:98).
TextCNNTensorGraph = TextCNNModel
WeaveTensorGraph = WeaveModel
DTNNTensorGraph = DTNNModel
DAGTensorGraph = DAGModel
GraphConvTensorGraph = GraphConvModel
MPNNTensorGraph = MPNNModel
TensorflowMultitaskIRVClassifier = MultitaskIRVClassifier


class XGBoostModel(GBDTModel):
    """Deprecated alias of GBDTModel (reference
    models/gbdt_models/gbdt_model.py XGBoostModel)."""

    def __init__(self, *args, **kwargs):
        import warnings
        warnings.warn('XGBoostModel is deprecated; use GBDTModel',
                      DeprecationWarning)
        super().__init__(*args, **kwargs)


__all__ += [
    'ScaledDotProductAttention', 'SelfAttention', 'GroverReadout',
    'GCN', 'GAT', 'AttentiveFP', 'Pagtn', 'DMPNN', 'MXMNet', 'CGCNN',
    'LCNN', 'TextCNNTensorGraph', 'WeaveTensorGraph', 'DTNNTensorGraph',
    'DAGTensorGraph', 'GraphConvTensorGraph', 'MPNNTensorGraph',
    'TensorflowMultitaskIRVClassifier', 'XGBoostModel',
    'MoLFormer', 'OneFormer', 'ProtBERT', 'DeepAbLLM',
]


class _BackendHarnessShim:
    """Migration shim for the reference's per-backend training harnesses.

    The reference maintains three parallel harnesses — KerasModel
    (models/keras_model.py:37), TorchModel (models/torch_models/
    torch_model.py:42) and the Lightning wrappers — that all expose the
    same fit/predict/evaluate contract.  This framework deliberately has
    ONE engine (JaxModel) implementing that contract TPU-first, so these
    names exist only to point reference users at the migration path
    instead of an AttributeError.
    """

    _replacement = 'JaxModel'

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            f'{type(self).__name__} is a reference-API name: this '
            'framework has a single TPU-native engine. Wrap your '
            'architecture as a flax module and construct '
            f'deepchem_tpu.models.{self._replacement} (same '
            'fit/predict/evaluate/checkpoint contract; see docs/API.md '
            '"Engine").')


class KerasModel(_BackendHarnessShim):
    pass


class TorchModel(_BackendHarnessShim):
    pass


class DCLightningModule(_BackendHarnessShim):
    pass


class DCLightningDatasetModule(_BackendHarnessShim):
    pass


__all__ += ['KerasModel', 'TorchModel', 'DCLightningModule',
            'DCLightningDatasetModule']
