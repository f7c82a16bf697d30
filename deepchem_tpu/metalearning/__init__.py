from deepchem_tpu.metalearning.maml import MetaLearner, MAML

__all__ = ['MetaLearner', 'MAML']
