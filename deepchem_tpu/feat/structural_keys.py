"""Structural-key fingerprints backed by the in-repo SMARTS engine.

MACCS-style 166 keys and PubChem/CACTVS-style 881 bits.  The reference
delegates both to external engines (RDKit MACCSkeys, PubChem's CACTVS);
here the keys are computed with deepchem_tpu.chem.smarts.  The key THEMES
follow the published definitions, but bit positions are not guaranteed
bit-compatible with RDKit/CACTVS — they are deterministic, documented,
and chemically equivalent for ML featurization purposes.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from deepchem_tpu.chem.mol import Molecule
from deepchem_tpu.chem.smarts import smarts_pattern

# --------------------------------------------------------------- MACCS

#: 166 structural keys, MACCS themes: element presence, ring systems,
#: atom environments, functional groups, counts.  Entries are either a
#: SMARTS string or ('count', smarts, n) requiring >= n embeddings.
MACCS_KEYS: List = [
    # --- exotic / heavy elements (keys 1-10 territory) ---
    '[#3,#11,#19,#37,#55]',                    # alkali metal
    '[#4,#12,#20,#38,#56]',                    # alkaline earth
    '[#22,#23,#24,#25,#26,#27,#28,#29,#30]',   # first-row transition metal
    '[#31,#32,#33,#34]',                       # Ga..Se
    '[#39,#40,#41,#42,#43,#44,#45,#46,#47,#48]',
    '[#13,#14]',                               # Al, Si
    '[#5]',                                    # boron
    '[#15]',                                   # phosphorus
    '[#33]',                                   # arsenic
    '[#34]',                                   # selenium
    # --- halogens ---
    '[#9]', '[#17]', '[#35]', '[#53]',
    ('count', '[#9,#17,#35,#53]', 2),
    '[#9,#17,#35,#53]~*~[#9,#17,#35,#53]',
    # --- hetero rings ---
    '[!#6;!#1]1~*~*~1',                        # 3-ring with heteroatom
    '*1~*~*~1',                                # any 3-ring
    '[!#6;!#1]1~*~*~*~1',                      # hetero 4-ring
    '*1~*~*~*~1',                              # any 4-ring
    '[!#6;!#1]1~*~*~*~*~1',                    # hetero 5-ring
    '*1~*~*~*~*~1',
    '[!#6;!#1]1~*~*~*~*~*~1',                  # hetero 6-ring
    '*1~*~*~*~*~*~1',
    '*1~*~*~*~*~*~*~1',                        # 7-ring
    '*1~*~*~*~*~*~*~*~1',                      # 8-ring
    ('count', '[R]', 1),                       # any ring atom
    ('count', '[R2]', 1),                      # fused ring atom
    '[nR]', '[oR]', '[sR]',                    # aromatic heteroatoms
    '[NR]', '[OR]', '[SR]',                    # aliphatic ring heteroatoms
    'c1ccccc1',                                # benzene
    ('count', 'c1ccccc1', 2),                  # two benzene rings
    'a1aaaa1',                                 # aromatic 5-ring
    # --- nitrogen environments ---
    '[#7]', ('count', '[#7]', 2),
    '[NX3;H2]',                                # primary amine
    '[NX3;H1]([#6])[#6]',                      # secondary amine
    '[NX3]([#6])([#6])[#6]',                   # tertiary amine
    '[N+]', '[#7;!R]=[#6]',                    # charged N / imine
    'N#C',                                     # nitrile
    '[NX3][CX3](=[OX1])',                      # amide
    '[NX3][NX3]',                              # hydrazine
    'N=N',                                     # azo
    '[N+](=O)[O-]',                            # nitro (charged form)
    'N(=O)=O',                                 # nitro (neutral form)
    '[#7]~[#8]',
    '[#7]~[#7]',
    'n', ('count', 'n', 2),
    '[#7]a',
    '[#7]~[#6]~[#7]',
    # --- oxygen environments ---
    '[#8]', ('count', '[#8]', 2), ('count', '[#8]', 4),
    '[OH]',                                    # hydroxyl
    ('count', '[OH]', 2),
    '[#6]=[#8]',                               # carbonyl
    ('count', '[#6]=[#8]', 2),
    '[CX3](=O)[OX2H1]',                        # carboxylic acid
    '[CX3](=O)[OX2][#6]',                      # ester
    '[OD2]([#6])[#6]',                         # ether
    '[CX3H1](=O)',                             # aldehyde
    '[#6][CX3](=O)[#6]',                       # ketone
    'o',
    '[#8]~[#8]',                               # peroxide-ish
    '[#8]~[#6]~[#8]',                          # acetal/carbonate theme
    'COC',
    '[#8;R]',
    'c[OH]',                                   # phenol
    '[O-]',
    # --- sulfur environments ---
    '[#16]', ('count', '[#16]', 2),
    '[SH]',                                    # thiol
    '[#16]=[#8]',                              # S=O
    '[#16](=[#8])=[#8]',                       # sulfone/sulfonyl
    '[#16X2]([#6])[#6]',                       # thioether
    '[#16]~[#16]',                             # disulfide
    's',
    '[#6]=[#16]',                              # thiocarbonyl
    '[#16;R]',
    '[#7]~[#16]',                              # N-S (sulfonamide theme)
    # --- phosphorus ---
    '[#15]~[#8]', '[#15](~[#8])(~[#8])~[#8]',
    # --- carbon skeleton ---
    'C#C',                                     # alkyne
    'C=C',                                     # alkene
    ('count', 'C=C', 2),
    '[CH3]', ('count', '[CH3]', 2), ('count', '[CH3]', 3),
    '[CH2]', ('count', '[CH2]', 4),
    '[CX4H0]',                                 # quaternary-ish C
    '[CX4](F)(F)F',                            # CF3
    '[#6](~[#6])(~[#6])(~[#6])~[#6]',          # branched C
    '*~[CH2]~[CH2]~*',                         # ethylene bridge
    '*~[CH2]~[CH2]~[CH2]~*',
    'c[CH3]',                                  # methyl on arene
    'cC=O',                                    # aryl carbonyl
    'c[NX3]',                                  # aniline theme
    'cF', 'cCl', 'cBr',
    'c[#7]', 'c[#8]', 'c[#16]',
    '[#6]#[#7]',
    # --- mixed 2-3 atom paths ---
    '[!#6;!#1]~[!#6;!#1]',                     # het-het bond
    '[!#6;!#1]~[!#6;!#1]~[!#6;!#1]',
    '[!#6;!#1]~[#6]~[!#6;!#1]',
    '[#8]=[#6]~[#6]=[#8]',                     # dicarbonyl
    '[#7]~[#6](~[#8])~[#8]',                   # carbamate theme
    '[#7]~[#6](~[#7])~[#7]',                   # guanidine theme
    '[#7]~[#6]=[#8]',
    '[#7]~[#6]=[#16]',                         # thioamide
    '[#8]~[#6]~[#7]',
    '[#6]~[#8]~[#6]~[#8]',
    '[F,Cl,Br,I]~[#6]~[#6]',
    '[!#6;!#1]~[CH2]~[!#6;!#1]',
    '[!#6;!#1]~[CH3]',
    '[#8]~[#16]~[#8]',
    '[#7]~[#8]',
    # --- ring environment details ---
    '[R](~[R])~[!R]',                          # ring-chain junction
    '[!R]~[R]~[!R]',
    '[R]~[R]',
    '[R]=[R]',                                 # ring double bond
    '[cR2]',                                   # fused aromatic atom
    '[#6;R]~[#8;!R]',                          # exocyclic O on ring C
    '[#6;R]=[#8;!R]',                          # cyclic ketone theme
    '[!#6;!#1;R]~[CH2;!R]',                    # het-ring-CH2 link
    '[#7;R]~[#6;!R]',
    # --- charges / global ---
    '[+]', '[-]',
    '[!#6;!#1;!#7;!#8;!#9;!#16;!#17;!#35;!#53;!#15;!#1]',  # unusual elem
    ('count', '*', 10), ('count', '*', 20), ('count', '*', 30),
    ('count', '[!#6;!#1]', 3),
    # --- hydrogen-count environments ---
    '[CH0;!R]', '[CH1;R]',
    '[NH0;!R]', '[#7;H2]',
    # --- longer paths (chain features) ---
    '*~*~*~*~*~*~*~*',                         # 8-atom path
    '[#8]~*~*~[#8]',                           # O..O 1,4
    '[#7]~*~*~[#7]',
    '[#7]~*~*~[#8]',
    '[#8]~*~*~*~[#8]',
    '[#7]~*~*~*~[#7]',
    '[F,Cl,Br,I]~*~*~[F,Cl,Br,I]',
    '[#16]~*~*~[#16]',
    '[CH3]~*~[CH3]',                           # gem/vicinal dimethyl
    '[CH3]~*~*~[CH3]',
    'a~*~a',                                   # aryl-X-aryl
    '[R]~*~[R]',                               # ring-linker-ring
    '[R]~*~*~[R]',
    # --- double-bond environments ---
    '[#6]=[#6]~[#8]',                          # enol ether / vinyl-O
    '[#6]=[#6]~[#7]',                          # enamine
    '[#6]=[#6]c',                              # styrene theme
    'C=C~C=C',
    '[#8]=[#6]~[#6]~[#8]',
    '[#8]=[#6]~[#6]~[#7]',
    '[#8]=[#6]~[#6]=[#6]',                     # enone
]


def maccs_fingerprint(mol: Molecule) -> np.ndarray:
    """167-length (bit 0 unused, MACCS convention) key vector."""
    bits = np.zeros(167, dtype=np.float64)
    for i, key in enumerate(MACCS_KEYS):
        slot = i + 1
        try:
            if isinstance(key, tuple):
                _, sma, n = key
                hit = smarts_pattern(sma).count(mol) >= n
            else:
                hit = smarts_pattern(key).match(mol)
        except Exception:
            hit = False
        bits[slot] = float(hit)
    return bits


# --------------------------------------------------------------- PubChem

_PUBCHEM_ELEMENT_COUNTS: List[Tuple[int, int]] = [
    # (atomic number, threshold); CACTVS section 1 hierarchy
    (1, 4), (1, 8), (1, 16), (1, 32),
    (3, 1), (3, 2),
    (5, 1), (5, 2), (5, 4),
    (6, 2), (6, 4), (6, 8), (6, 16), (6, 32),
    (7, 1), (7, 2), (7, 4), (7, 8),
    (8, 1), (8, 2), (8, 4), (8, 8), (8, 16),
    (9, 1), (9, 2), (9, 4),
    (11, 1), (11, 2),
    (14, 1), (14, 2),
    (15, 1), (15, 2), (15, 4),
    (16, 1), (16, 2), (16, 4), (16, 8),
    (17, 1), (17, 2), (17, 4), (17, 8),
    (19, 1), (19, 2),
    (35, 1), (35, 2),
    (53, 1), (53, 2),
    (20, 1), (26, 1), (29, 1), (30, 1), (12, 1), (13, 1), (33, 1),
    (34, 1), (78, 1), (80, 1),
]

_PUBCHEM_RING_SIZES = range(3, 11)           # ESSSR sections 2

_PUBCHEM_ATOM_PAIRS = [
    (3, 1), (3, 3), (3, 6), (3, 7), (3, 8), (3, 9), (3, 15), (3, 16),
    (3, 17), (5, 1), (5, 5), (5, 6), (5, 7), (5, 8), (5, 9), (5, 14),
    (5, 15), (5, 16), (5, 17), (5, 35), (6, 1), (6, 6), (6, 7), (6, 8),
    (6, 9), (6, 11), (6, 12), (6, 13), (6, 14), (6, 15), (6, 16),
    (6, 17), (6, 19), (6, 20), (6, 33), (6, 34), (6, 35), (6, 53),
    (7, 1), (7, 7), (7, 8), (7, 9), (7, 14), (7, 15), (7, 16), (7, 17),
    (7, 35), (8, 1), (8, 8), (8, 14), (8, 15), (8, 16), (8, 17),
    (15, 1), (15, 15), (15, 16), (16, 1), (16, 16), (14, 1), (14, 14),
    (14, 17), (9, 15), (9, 16),
]

# sections 5-7: common SMARTS environments (subset of CACTVS's lists)
_PUBCHEM_SMARTS = [
    '[#6](~[#6])(~[#6])', '[#6](~[#6])(~[#6])(~[#6])',
    '[#6](~[#6])(~[#6])(~[#6])(~[#6])', '[#6;H1](~[#6])(~[#6])',
    '[#6](~[#6])(~[#7])', '[#6](~[#6])(~[#8])', '[#6](~[#7])(~[#8])',
    '[#6](~[#6])(~[#16])', '[#6](~[#6])(~[F,Cl,Br,I])',
    '[#7](~[#6])(~[#6])', '[#7](~[#6])(~[#6])(~[#6])',
    '[#8](~[#6])(~[#6])', '[#16](~[#6])(~[#6])',
    '[#6]=[#6]', '[#6]#[#6]', '[#6]=[#7]', '[#6]#[#7]', '[#6]=[#8]',
    '[#6]=[#16]', '[#7]=[#7]', '[#7]=[#8]', '[#16]=[#8]',
    '[#6](=[#8])(~[#8])', '[#6](=[#8])(~[#7])', '[#6](=[#8])(~[#6])',
    'c1ccccc1', 'c1ccncc1', 'c1ccoc1', 'c1ccsc1', 'c1cc[nH]c1',
    'C1CCCCC1', 'C1CCCC1', 'C1CCOC1', 'C1CCNC1',
    '[OH]c1ccccc1', '[NX3]c1ccccc1', 'Clc1ccccc1', '[CH3]c1ccccc1',
    '[CX3](=O)[OX2H1]', '[CX3](=O)[OX2][#6]', '[NX3][CX3](=[OX1])',
    '[N+](=O)[O-]', '[SX4](=O)(=O)', 'N#C[#6]', '[NX3;H2][#6]',
    '[OH][CX4]', '[SH][#6]', '[F,Cl,Br,I][CX4]',
    '[#6]~[#6]~[#6]~[#6]~[#6]~[#6]~[#6]~[#6]',          # C8 chain
    '[#8]~[#6]~[#6]~[#8]', '[#7]~[#6]~[#6]~[#7]',
    '[#7]~[#6]~[#6]~[#8]', 'a~a~a~a~a~a',
]


def pubchem_fingerprint(mol: Molecule) -> np.ndarray:
    """881-length PubChem/CACTVS-style substructure fingerprint.

    Sections: [element counts | ESSSR ring features | bonded atom pairs |
    SMARTS environments | hashed Morgan backfill to 881].
    """
    bits: List[float] = []
    # section 1: element counts (H via total_hs)
    counts: Dict[int, int] = {}
    h = 0
    for a in mol.atoms:
        counts[a.atomic_num] = counts.get(a.atomic_num, 0) + 1
        h += a.total_hs
    counts[1] = counts.get(1, 0) + h
    for z, thr in _PUBCHEM_ELEMENT_COUNTS:
        bits.append(float(counts.get(z, 0) >= thr))
    # section 2: ring features per size
    rings = mol.rings()
    for size in _PUBCHEM_RING_SIZES:
        of_size = [r for r in rings if len(r) == size]
        for thr in (1, 2):
            bits.append(float(len(of_size) >= thr))
        arom = [r for r in of_size
                if all(mol.atoms[i].is_aromatic for i in r)]
        het = [r for r in of_size
               if any(mol.atoms[i].atomic_num != 6 for i in r)]
        sat = [r for r in of_size
               if all(not mol.atoms[i].is_aromatic for i in r)]
        bits += [float(bool(arom)), float(bool(het)), float(bool(sat)),
                 float(bool(het and arom)), float(bool(het and sat))]
    # section 3: bonded element pairs
    pair_present = set()
    for b in mol.bonds:
        z1 = mol.atoms[b.a1].atomic_num
        z2 = mol.atoms[b.a2].atomic_num
        pair_present.add((min(z1, z2), max(z1, z2)))
    for z1, z2 in _PUBCHEM_ATOM_PAIRS:
        key = (min(z1, z2), max(z1, z2))
        if z2 == 1:
            hit = counts.get(z1, 0) > 0 and any(
                a.atomic_num == z1 and a.total_hs > 0 for a in mol.atoms)
        else:
            hit = key in pair_present
        bits.append(float(hit))
    # sections 5-7: SMARTS environments
    for sma in _PUBCHEM_SMARTS:
        try:
            bits.append(float(smarts_pattern(sma).match(mol)))
        except Exception:
            bits.append(0.0)
    out = np.zeros(881, dtype=np.float64)
    n = min(len(bits), 881)
    out[:n] = bits[:n]
    # backfill the remaining positions with hashed Morgan bits so the
    # vector keeps CACTVS's 881 width and stays informative
    from deepchem_tpu.chem import morgan_fingerprint
    rest = 881 - n
    if rest > 0:
        out[n:] = morgan_fingerprint(mol, 2, rest)
    return out
