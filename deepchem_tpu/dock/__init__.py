from deepchem_tpu.dock.binding_pocket import (BindingPocketFinder,
                                              ConvexHullPocketFinder)
from deepchem_tpu.dock.pose_generation import (PoseGenerator,
                                               VinaPoseGenerator,
                                               GninaPoseGenerator)
from deepchem_tpu.dock.pose_scoring import (vina_nonlinearity, vina_gaussian,
                                            vina_repulsion, vina_hydrophobic,
                                            vina_hbond, vina_energy_term,
                                            pairwise_distances, cutoff_filter)
from deepchem_tpu.dock.docking import Docker

__all__ = ['BindingPocketFinder', 'ConvexHullPocketFinder', 'PoseGenerator',
           'VinaPoseGenerator', 'GninaPoseGenerator', 'Docker',
           'vina_nonlinearity', 'vina_gaussian', 'vina_repulsion',
           'vina_hydrophobic', 'vina_hbond', 'vina_energy_term',
           'pairwise_distances', 'cutoff_filter']
