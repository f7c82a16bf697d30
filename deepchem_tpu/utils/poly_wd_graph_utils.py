"""Weighted-directed polymer graph utilities (wD-MPNN input prep).

Redesign of reference deepchem/utils/poly_wd_graph_utils.py (Aldeghi &
Coley 2022 polymer-ensemble representation) on the in-repo chem core:
polymer datapoint strings
``[mono1].[mono2]|frac1|frac2|<rule1<rule2`` with rules
``R1-R2:w_fwd:w_rev`` become molecules whose atoms carry per-monomer
weights and whose wildcard (*) attachment points define weighted
directed inter-monomer bonds.
"""

from __future__ import annotations

import math
import re
from typing import List, Tuple

from deepchem_tpu.chem import mol_from_smiles
from deepchem_tpu.chem.mol import Molecule


def onek_encoding_unk(value, choices: list) -> list:
    """One-hot with a trailing unknown slot (reference
    poly_wd_graph_utils.py:247)."""
    encoding = [0] * (len(choices) + 1)
    index = choices.index(value) if value in choices else -1
    encoding[index] = 1
    return encoding


def handle_hydrogen(smiles: str, keep_h: bool = True,
                    add_h: bool = False) -> Molecule:
    """Parse a monomer SMILES; the in-repo core keeps hydrogens implicit
    (explicit bracket H counts are preserved when keep_h)."""
    mol = mol_from_smiles(smiles)
    if mol is None:
        raise ValueError(f'invalid monomer SMILES {smiles!r}')
    if not keep_h:
        for a in mol.atoms:
            a.explicit_hs = -1        # re-perceive implicit H counts
        mol = mol.finalize()
    return mol


def make_polymer_mol(smiles: str, fragment_weights: List[float],
                     keep_h: bool = True,
                     add_h: bool = False) -> Molecule:
    """Join monomer molecules into one graph; every atom gets a
    ``w_frag`` attribute carrying its monomer's weight (reference
    make_polymer_mol stores an RDKit double prop)."""
    monomers = smiles.split('.')
    if len(monomers) != len(fragment_weights):
        raise ValueError(
            f'number of monomers ({len(monomers)}) and weights '
            f'({len(fragment_weights)}) must match')
    out = Molecule()
    for mono, w in zip(monomers, fragment_weights):
        sub = handle_hydrogen(mono, keep_h, add_h)
        offset = out.num_atoms
        for a in sub.atoms:
            idx = out.add_atom(a)
            out.atoms[idx].w_frag = float(w)
        for b in sub.bonds:
            out.add_bond(b.a1 + offset, b.a2 + offset, order=b.order,
                         is_aromatic=b.is_aromatic)
    return out.finalize()


def parse_polymer_rules(rules: List[str]) -> Tuple[List[tuple], float]:
    """Rule strings 'R1-R2:w12:w21' -> [(R1, R2, w12, w21)] plus the
    degree-of-polymerization factor 1 + log10(Xn) ('~Xn' suffix on the
    last rule; reference poly_wd_graph_utils.py:116)."""
    polymer_info = []
    rules = list(rules)
    if rules and '~' in rules[-1]:
        rule, xn = rules[-1].split('~')
        rules[-1] = rule
        Xn = float(xn)
    else:
        Xn = 1.0
    for rule in rules:
        if rule == '':
            continue
        parts = rule.split(':')
        if len(parts) != 3:
            raise ValueError(f'incorrect rule format {rule!r}')
        ends = parts[0].split('-')
        if len(ends) != 2:
            raise ValueError(f'incorrect bond index format {rule!r}')
        polymer_info.append((ends[0], ends[1], float(parts[1]),
                             float(parts[2])))
    return polymer_info, 1.0 + math.log10(Xn)


def tag_atoms_in_repeating_unit(mol: Molecule
                                ) -> Tuple[Molecule, dict]:
    """Mark non-wildcard atoms as core (atom.core = True) and map each
    wildcard's R-group label to the atom it caps (reference
    tag_atoms_in_repeating_unit)."""
    r_map = {}
    for a in mol.atoms:
        a.core = a.atomic_num != 0
    for a in mol.atoms:
        if a.atomic_num == 0:
            label = str(a.atom_map or a.isotope or '')
            nbrs = mol.neighbors(a.index)
            if label and nbrs:
                r_map[label] = nbrs[0]
                mol.atoms[nbrs[0]].r_label = label
    return mol, r_map


def remove_wildcard_atoms(mol: Molecule) -> Molecule:
    """Drop * attachment atoms, keeping all real atoms + their metadata
    (reference remove_wildcard_atoms)."""
    keep = [i for i, a in enumerate(mol.atoms) if a.atomic_num != 0]
    sub = mol.subgraph(keep)
    # carry per-atom polymer metadata through the subgraph copy
    for new_i, old_i in enumerate(keep):
        for attr in ('w_frag', 'core', 'r_label'):
            if hasattr(mol.atoms[old_i], attr):
                setattr(sub.atoms[new_i], attr,
                        getattr(mol.atoms[old_i], attr))
    return sub


class PolyWDGStringValidator:
    """Validate wD-MPNN polymer datapoint strings (reference
    poly_wd_graph_utils.py:313)."""

    @staticmethod
    def get_parsed_vals(datapoint: str) -> Tuple[str, list, str]:
        parts = datapoint.split('|')
        if len(parts) < 3:
            raise ValueError(
                'Invalid datapoint format: at least 3 "|" fields needed, '
                f'found {len(parts)}')
        return parts[0], parts[1:-1], parts[-1]

    @staticmethod
    def get_polymer_rules(rules_str: str) -> List[str]:
        if len(rules_str.split('<')) == 1:
            raise ValueError(
                "Invalid rules string: missing '<' rule separator")
        return rules_str.split('<')[1:]

    def validate(self, datapoint: str) -> bool:
        monomers, fragments, rules_str = self.get_parsed_vals(datapoint)
        mono_list = monomers.split('.')
        if len(fragments) != len(mono_list):
            raise ValueError(
                f'number of fragments ({len(fragments)}) must match '
                f'number of monomers ({len(mono_list)})')
        for f in fragments:
            float(f)                       # raises on malformed fraction
        wildcards = sorted(set(int(x) for x in
                               re.findall(r'\[(\d+)\*?\]|\[\*:(\d+)\]',
                                          monomers)
                               for x in x if x))
        if not wildcards:
            wildcards = sorted(set(
                int(x) for x in re.findall(r'(\d+)\*', monomers)))
        if wildcards and wildcards != list(range(1, len(wildcards) + 1)):
            raise ValueError(
                f'wildcard labels must be 1..N, got {wildcards}')
        rules, _ = parse_polymer_rules(self.get_polymer_rules(rules_str))
        for r1, r2, w12, w21 in rules:
            for r in (r1, r2):
                if wildcards and int(r) not in wildcards:
                    raise ValueError(
                        f'rule references unknown attachment point {r}')
        for mono in mono_list:
            if mol_from_smiles(mono.replace('*', 'H')) is None and \
                    mol_from_smiles(mono) is None:
                raise ValueError(f'invalid monomer SMILES {mono!r}')
        return True
