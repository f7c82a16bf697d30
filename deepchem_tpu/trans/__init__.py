from deepchem_tpu.trans.transformers import (
    Transformer, undo_transforms, undo_grad_transforms, MinMaxTransformer,
    NormalizationTransformer, ClippingTransformer, LogTransformer,
    BalancingTransformer, DuplicateBalancingTransformer, CDFTransformer,
    PowerTransformer, FlatteningTransformer, FeaturizationTransformer,
    ImageTransformer, CoulombFitTransformer, IRVTransformer,
    RxnSplitTransformer, DataTransforms)

__all__ = [
    'Transformer', 'undo_transforms', 'undo_grad_transforms',
    'MinMaxTransformer', 'NormalizationTransformer', 'ClippingTransformer',
    'LogTransformer', 'BalancingTransformer', 'DuplicateBalancingTransformer',
    'CDFTransformer', 'PowerTransformer', 'FlatteningTransformer',
    'FeaturizationTransformer', 'ImageTransformer', 'CoulombFitTransformer',
    'IRVTransformer', 'RxnSplitTransformer', 'DataTransforms',
]


# DAGTransformer lives next to DAGModel (models/dag.py); resolved
# lazily to avoid a trans <-> models import cycle (the reference keeps
# it in trans/transformers.py:1772).
__all__.append('DAGTransformer')


def __getattr__(name):
    if name == 'DAGTransformer':
        from deepchem_tpu.models.dag import DAGTransformer
        return DAGTransformer
    raise AttributeError(
        f'module {__name__!r} has no attribute {name!r}')
