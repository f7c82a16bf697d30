"""Polymer featurizers: weighted directed graphs for wD-MPNN.

Concrete featurizer over the reference's polymer datapoint format
(``[mono1].[mono2]|frac1|frac2|<rules``, Aldeghi & Coley 2022): produces
:class:`WeightedDirectedGraphData` with per-atom monomer weights and
directed inter-monomer edges weighted by the bond-fraction rules.
Reference counterpart: utils/poly_wd_graph_utils.py + the
PolymerFeaturizer hierarchy (feat/base_classes.py:480).
"""

from __future__ import annotations

from typing import List

import numpy as np

from deepchem_tpu.feat.base import PolymerFeaturizer
from deepchem_tpu.feat.graph_data import WeightedDirectedGraphData
from deepchem_tpu.feat import feature_utils as fu
from deepchem_tpu.utils.poly_wd_graph_utils import (
    PolyWDGStringValidator, make_polymer_mol, parse_polymer_rules,
    tag_atoms_in_repeating_unit)


class PolyWDGFeaturizer(PolymerFeaturizer):
    """Polymer string -> WeightedDirectedGraphData.

    Nodes: heavy atoms of all monomers (wildcards dropped), 75-dim
    features, node_weights = monomer fractions.  Edges: intra-monomer
    bonds both directions with weight 1; inter-monomer attachment edges
    per rule with the forward/reverse bond fractions.  ``degree_of_poly``
    (1 + log10(Xn)) rides along as a graph attribute.
    """

    def __init__(self, validate: bool = True):
        self.validate = validate
        self._validator = PolyWDGStringValidator()

    def _featurize(self, datapoint: str, **kwargs
                   ) -> WeightedDirectedGraphData:
        if self.validate:
            self._validator.validate(datapoint)
        monomers, fragments, rules_str = \
            self._validator.get_parsed_vals(datapoint)
        mol = make_polymer_mol(monomers,
                               [float(f) for f in fragments])
        mol, r_map = tag_atoms_in_repeating_unit(mol)
        rules, dop = parse_polymer_rules(
            self._validator.get_polymer_rules(rules_str))
        core = [i for i, a in enumerate(mol.atoms) if a.atomic_num != 0]
        remap = {old: new for new, old in enumerate(core)}
        node_features = np.stack(
            [fu.atom_features_75(mol.atoms[i], mol) for i in core])
        node_weights = np.asarray(
            [getattr(mol.atoms[i], 'w_frag', 1.0) for i in core],
            dtype=np.float32)
        src: List[int] = []
        dst: List[int] = []
        wts: List[float] = []
        for b in mol.bonds:
            if b.a1 in remap and b.a2 in remap:
                src += [remap[b.a1], remap[b.a2]]
                dst += [remap[b.a2], remap[b.a1]]
                wts += [1.0, 1.0]
        for r1, r2, w12, w21 in rules:
            if r1 not in r_map or r2 not in r_map:
                raise ValueError(
                    f'rule references missing attachment point '
                    f'{r1}-{r2}; known: {sorted(r_map)}')
            a = remap[r_map[r1]]
            b = remap[r_map[r2]]
            src += [a, b]
            dst += [b, a]
            wts += [float(w12), float(w21)]
        edge_index = np.asarray([src, dst], dtype=np.int64)
        return WeightedDirectedGraphData(
            node_features, edge_index,
            edge_weights=np.asarray(wts, dtype=np.float32),
            node_weights=node_weights, degree_of_poly=float(dop))
