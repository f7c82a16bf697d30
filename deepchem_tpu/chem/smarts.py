"""SMARTS substructure matching (pure Python, practical subset).

The reference relies on RDKit's SMARTS engine for structural keys
(MACCS), functional-group detection, and interaction fingerprints.  This
module implements the commonly-used SMARTS subset over the in-repo
:class:`~deepchem_tpu.chem.mol.Molecule` graph:

Atoms: organic-subset symbols (``C N O S P F Cl Br I B``), aromatic
lowercase (``c n o s p``), wildcard ``*``, aromatic/aliphatic ``a``/``A``,
and bracket expressions ``[...]`` with primitives ``#n`` (atomic number),
element symbols, ``a``/``A``, ``Dn`` (heavy degree), ``Hn`` (total H),
``Xn`` (total connections incl. H), ``R``/``Rn``/``!R`` (ring membership/
count), ``rn`` (in ring of size n), ``+n``/``-n`` (charge), ``vn``
(valence), negation ``!``, conjunction ``&`` (or juxtaposition),
disjunction ``,``; ``;`` as low-precedence AND.

Bonds: default (single-or-aromatic), ``-``, ``=``, ``#``, ``:``
(aromatic), ``~`` (any), ``@`` (ring bond).

Supports branches, ring closures (including ``%nn``), and multiple
components separated by ``.`` (each must match disjointly).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from .mol import (Molecule, PERIODIC_TABLE, BOND_SINGLE, BOND_DOUBLE,
                  BOND_TRIPLE, BOND_AROMATIC)

_ORGANIC_2 = ('Cl', 'Br')
_ORGANIC_1 = set('BCNOSPFI')
_AROMATIC_1 = set('cnosp')


class SmartsParseError(ValueError):
    pass


# ---------------------------------------------------------------- atom AST

@dataclass
class _AtomExpr:
    """Disjunction (OR) of conjunctions (AND) of (negate, primitive)."""
    terms: List[List[Tuple[bool, Tuple]]]

    def matches(self, mol: Molecule, idx: int) -> bool:
        atom = mol.atoms[idx]
        for conj in self.terms:
            ok = True
            for neg, prim in conj:
                val = _eval_prim(prim, mol, atom, idx)
                if val == neg:
                    ok = False
                    break
            if ok:
                return True
        return False


def _eval_prim(prim: Tuple, mol: Molecule, atom, idx: int) -> bool:
    kind = prim[0]
    if kind == 'any':
        return True
    if kind == 'elem':
        return atom.atomic_num == prim[1] and \
            (prim[2] is None or atom.is_aromatic == prim[2])
    if kind == 'arom':
        return atom.is_aromatic
    if kind == 'aliph':
        return not atom.is_aromatic
    if kind == 'degree':
        return atom.degree == prim[1]
    if kind == 'totalh':
        return atom.total_hs == prim[1]
    if kind == 'conn':
        return atom.degree + atom.total_hs == prim[1]
    if kind == 'ring':
        if prim[1] is None:
            return atom.in_ring
        return sum(idx in r for r in mol.rings()) == prim[1]
    if kind == 'ringsize':
        return mol.is_atom_in_ring_of_size(idx, prim[1])
    if kind == 'charge':
        return atom.formal_charge == prim[1]
    if kind == 'valence':
        order = sum(int(b.order) if b.order != BOND_AROMATIC else 1
                    for b in mol.atom_bonds(idx))
        arom = sum(1 for b in mol.atom_bonds(idx)
                   if b.order == BOND_AROMATIC)
        return order + (arom + 1) // 2 + atom.total_hs == prim[1]
    raise SmartsParseError(f'unknown primitive {prim}')


# ---------------------------------------------------------------- bond AST

_BOND_ANY = 'any'


def _bond_matches(spec: Optional[str], bond) -> bool:
    if spec is None:                      # default: single or aromatic
        return (bond.order == BOND_SINGLE and not bond.is_aromatic) \
            or bond.is_aromatic or bond.order == BOND_AROMATIC
    if spec == _BOND_ANY:
        return True
    if spec == '-':
        return bond.order == BOND_SINGLE and not bond.is_aromatic
    if spec == '=':
        return bond.order == BOND_DOUBLE
    if spec == '#':
        return bond.order == BOND_TRIPLE
    if spec == ':':
        return bond.is_aromatic or bond.order == BOND_AROMATIC
    if spec == '@':
        return bond.in_ring
    raise SmartsParseError(f'unknown bond spec {spec!r}')


# ---------------------------------------------------------------- pattern

@dataclass
class _QueryAtom:
    expr: _AtomExpr
    index: int


@dataclass
class _QueryBond:
    a1: int
    a2: int
    spec: Optional[str]


class Pattern:
    """A parsed SMARTS query (one or more disconnected components)."""

    def __init__(self, smarts: str):
        self.smarts = smarts
        self.components: List[Tuple[List[_QueryAtom],
                                    List[_QueryBond]]] = []
        for part in _split_components(smarts):
            self.components.append(_parse_component(part))

    # -- matching --

    def find_all(self, mol: Molecule,
                 unique_sets: bool = True) -> List[Tuple[int, ...]]:
        """All embeddings of the FIRST component (like RDKit
        GetSubstructMatches; multi-component patterns use match())."""
        atoms, bonds = self.components[0]
        out = _embed(mol, atoms, bonds, limit=None)
        if unique_sets:
            seen, uniq = set(), []
            for m in out:
                key = frozenset(m)
                if key not in seen:
                    seen.add(key)
                    uniq.append(m)
            return uniq
        return out

    def match(self, mol: Molecule) -> bool:
        """True if every component embeds with pairwise-disjoint atoms."""
        if len(self.components) == 1:
            atoms, bonds = self.components[0]
            return bool(_embed(mol, atoms, bonds, limit=1))
        embeddings = [_embed(mol, a, b, limit=None)
                      for a, b in self.components]
        if any(not e for e in embeddings):
            return False

        def backtrack(ci: int, used: frozenset) -> bool:
            if ci == len(embeddings):
                return True
            for emb in embeddings[ci]:
                s = set(emb)
                if not (s & used):
                    if backtrack(ci + 1, used | s):
                        return True
            return False
        return backtrack(0, frozenset())

    def count(self, mol: Molecule) -> int:
        return len(self.find_all(mol))


def _embed(mol: Molecule, qatoms: List[_QueryAtom],
           qbonds: List[_QueryBond],
           limit: Optional[int]) -> List[Tuple[int, ...]]:
    """Backtracking subgraph isomorphism (VF2-style candidate order)."""
    nq = len(qatoms)
    # adjacency of the query
    qadj: Dict[int, List[Tuple[int, Optional[str]]]] = {
        i: [] for i in range(nq)}
    for qb in qbonds:
        qadj[qb.a1].append((qb.a2, qb.spec))
        qadj[qb.a2].append((qb.a1, qb.spec))
    results: List[Tuple[int, ...]] = []
    mapping: Dict[int, int] = {}
    used = set()

    # order: BFS from atom 0 so each new query atom touches the mapped set
    order = []
    seen_q = set()
    stack = list(range(nq))
    while stack:
        root = stack.pop(0)
        if root in seen_q:
            continue
        frontier = [root]
        seen_q.add(root)
        while frontier:
            cur = frontier.pop(0)
            order.append(cur)
            for nb, _ in qadj[cur]:
                if nb not in seen_q:
                    seen_q.add(nb)
                    frontier.append(nb)

    def consistent(qi: int, mi: int) -> bool:
        if not qatoms[qi].expr.matches(mol, mi):
            return False
        for nb, spec in qadj[qi]:
            if nb in mapping:
                bond = mol.get_bond(mi, mapping[nb])
                if bond is None or not _bond_matches(spec, bond):
                    return False
        return True

    def backtrack(depth: int) -> bool:
        if depth == len(order):
            results.append(tuple(mapping[i] for i in range(nq)))
            return limit is not None and len(results) >= limit
        qi = order[depth]
        # candidates: neighbors of already-mapped query neighbors, else all
        cand = None
        for nb, _ in qadj[qi]:
            if nb in mapping:
                cand = [a for a in mol.neighbors(mapping[nb])
                        if a not in used]
                break
        if cand is None:
            cand = [a for a in range(mol.num_atoms) if a not in used]
        for mi in cand:
            if consistent(qi, mi):
                mapping[qi] = mi
                used.add(mi)
                if backtrack(depth + 1):
                    return True
                del mapping[qi]
                used.discard(mi)
        return False

    backtrack(0)
    return results


# ---------------------------------------------------------------- parser

def _split_components(s: str) -> List[str]:
    parts, depth, buf = [], 0, []
    for ch in s:
        if ch == '(':
            depth += 1
        elif ch == ')':
            depth -= 1
        if ch == '.' and depth == 0:
            parts.append(''.join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append(''.join(buf))
    return [p for p in parts if p]


def _parse_bracket(body: str) -> _AtomExpr:
    """Parse the inside of [...] into an OR-of-ANDs expression."""
    terms: List[List[Tuple[bool, Tuple]]] = [[]]
    i = 0
    neg = False
    while i < len(body):
        ch = body[i]
        if ch == ',':
            terms.append([])
            neg = False
            i += 1
            continue
        if ch in '&;':
            i += 1
            continue
        if ch == '!':
            neg = not neg
            i += 1
            continue
        prim, i = _parse_primitive(body, i)
        terms[-1].append((neg, prim))
        neg = False
    return _AtomExpr([t for t in terms if t] or [[(False, ('any',))]])


def _read_int(s: str, i: int, default: Optional[int] = None
              ) -> Tuple[Optional[int], int]:
    j = i
    while j < len(s) and s[j].isdigit():
        j += 1
    if j == i:
        return default, i
    return int(s[i:j]), j


def _parse_primitive(s: str, i: int) -> Tuple[Tuple, int]:
    ch = s[i]
    if ch == '*':
        return ('any',), i + 1
    if ch == '#':
        n, i = _read_int(s, i + 1)
        if n is None:
            raise SmartsParseError('expected number after #')
        return ('elem', n, None), i
    if ch == 'a':
        return ('arom',), i + 1
    if ch == 'A':
        return ('aliph',), i + 1
    if ch == 'D':
        n, i = _read_int(s, i + 1, 1)
        return ('degree', n), i
    if ch == 'H':
        n, i = _read_int(s, i + 1, 1)
        return ('totalh', n), i
    if ch == 'X':
        n, i = _read_int(s, i + 1, 1)
        return ('conn', n), i
    if ch == 'R':
        n, i = _read_int(s, i + 1, None)
        return ('ring', n), i
    if ch == 'r':
        n, i = _read_int(s, i + 1, None)
        if n is None:
            return ('ring', None), i
        return ('ringsize', n), i
    if ch == 'v':
        n, i = _read_int(s, i + 1, 1)
        return ('valence', n), i
    if ch in '+-':
        sign = 1 if ch == '+' else -1
        j = i + 1
        # '++' / '--' runs or explicit number
        run = 1
        while j < len(s) and s[j] == ch:
            run += 1
            j += 1
        n, j2 = _read_int(s, j, None)
        if n is not None:
            return ('charge', sign * n), j2
        return ('charge', sign * run), j
    # two-letter elements first
    if s[i:i + 2] in _ORGANIC_2 or (s[i:i + 2] and s[i:i + 2] in
                                    PERIODIC_TABLE and s[i + 1:i + 2].islower()
                                    and s[i:i + 2] not in ('no',)):
        sym = s[i:i + 2]
        if sym in PERIODIC_TABLE:
            return ('elem', PERIODIC_TABLE[sym], False), i + 2
    if ch.isupper():
        sym = ch
        if sym in PERIODIC_TABLE:
            return ('elem', PERIODIC_TABLE[sym], False), i + 1
    if ch.islower():
        sym = ch.upper()
        if sym in PERIODIC_TABLE:
            return ('elem', PERIODIC_TABLE[sym], True), i + 1
    raise SmartsParseError(f'cannot parse primitive at {s[i:]!r}')


def _parse_component(s: str) -> Tuple[List[_QueryAtom], List[_QueryBond]]:
    atoms: List[_QueryAtom] = []
    bonds: List[_QueryBond] = []
    prev: Optional[int] = None
    pending_bond: Optional[str] = None
    branch_stack: List[int] = []
    ring_open: Dict[str, Tuple[int, Optional[str]]] = {}
    i = 0

    def add_atom(expr: _AtomExpr) -> int:
        nonlocal prev, pending_bond
        idx = len(atoms)
        atoms.append(_QueryAtom(expr, idx))
        if prev is not None:
            bonds.append(_QueryBond(prev, idx, pending_bond))
        prev = idx
        pending_bond = None
        return idx

    while i < len(s):
        ch = s[i]
        if ch == '(':
            branch_stack.append(prev)
            i += 1
        elif ch == ')':
            if not branch_stack:
                raise SmartsParseError(f'unbalanced ) in {s!r}')
            prev = branch_stack.pop()
            i += 1
        elif ch in '-=#:~@':
            pending_bond = _BOND_ANY if ch == '~' else ch
            i += 1
        elif ch == '/' or ch == '\\':
            pending_bond = '-'
            i += 1
        elif ch.isdigit() or ch == '%':
            if ch == '%':
                label = s[i + 1:i + 3]
                i += 3
            else:
                label = ch
                i += 1
            if label in ring_open:
                a, spec = ring_open.pop(label)
                bonds.append(_QueryBond(a, prev,
                                        spec if spec else pending_bond))
            else:
                ring_open[label] = (prev, pending_bond)
            pending_bond = None
        elif ch == '[':
            depth = 1
            j = i + 1
            while j < len(s) and depth:
                if s[j] == '[':
                    depth += 1
                elif s[j] == ']':
                    depth -= 1
                j += 1
            add_atom(_parse_bracket(s[i + 1:j - 1]))
            i = j
        elif ch == '*':
            add_atom(_AtomExpr([[(False, ('any',))]]))
            i += 1
        elif s[i:i + 2] in _ORGANIC_2:
            add_atom(_AtomExpr(
                [[(False, ('elem', PERIODIC_TABLE[s[i:i + 2]], False))]]))
            i += 2
        elif ch in _ORGANIC_1:
            add_atom(_AtomExpr(
                [[(False, ('elem', PERIODIC_TABLE[ch], False))]]))
            i += 1
        elif ch in _AROMATIC_1:
            add_atom(_AtomExpr(
                [[(False, ('elem', PERIODIC_TABLE[ch.upper()], True))]]))
            i += 1
        elif ch == 'a':
            add_atom(_AtomExpr([[(False, ('arom',))]]))
            i += 1
        elif ch == 'A':
            add_atom(_AtomExpr([[(False, ('aliph',))]]))
            i += 1
        else:
            raise SmartsParseError(f'unexpected {ch!r} in {s!r}')
    if ring_open:
        raise SmartsParseError(f'unclosed ring bonds in {s!r}')
    if branch_stack:
        raise SmartsParseError(f'unclosed branches in {s!r}')
    if not atoms:
        raise SmartsParseError(f'empty pattern {s!r}')
    return atoms, bonds


# ---------------------------------------------------------------- API

_PATTERN_CACHE: Dict[str, Pattern] = {}


def smarts_pattern(smarts: str) -> Pattern:
    pat = _PATTERN_CACHE.get(smarts)
    if pat is None:
        pat = Pattern(smarts)
        _PATTERN_CACHE[smarts] = pat
    return pat


def has_substructure(mol: Molecule, smarts: str) -> bool:
    return smarts_pattern(smarts).match(mol)


def count_substructures(mol: Molecule, smarts: str) -> int:
    return smarts_pattern(smarts).count(mol)


def find_substructures(mol: Molecule, smarts: str
                       ) -> List[Tuple[int, ...]]:
    return smarts_pattern(smarts).find_all(mol)
