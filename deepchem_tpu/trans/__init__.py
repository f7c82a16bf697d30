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
