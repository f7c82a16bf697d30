"""SDF / MDL molblock reader (pure Python).

Covers V2000 connection tables with 3D coordinates — the role RDKit's
``SDMolSupplier`` plays for the reference SDF loader (reference
deepchem/data/data_loader.py:733 ``SDFLoader`` and
deepchem/utils/rdkit_utils.py load paths).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple

from .mol import Atom, Molecule, PERIODIC_TABLE, BOND_AROMATIC

_MDL_BOND_ORDER = {1: 1.0, 2: 2.0, 3: 3.0, 4: BOND_AROMATIC}
_MDL_CHARGE = {0: 0, 1: 3, 2: 2, 3: 1, 4: 0, 5: -1, 6: -2, 7: -3}


def mol_from_molblock(block: str) -> Optional[Molecule]:
    """Parse one V2000 molblock; returns None on failure."""
    try:
        return _parse_molblock(block)
    except (ValueError, IndexError):
        return None


def _parse_molblock(block: str) -> Molecule:
    lines = block.split('\n')
    counts = lines[3]
    natoms = int(counts[0:3])
    nbonds = int(counts[3:6])
    mol = Molecule()
    coords: List[Tuple[float, float, float]] = []
    for i in range(natoms):
        ln = lines[4 + i]
        x, y, z = float(ln[0:10]), float(ln[10:20]), float(ln[20:30])
        sym = ln[31:34].strip()
        if sym not in PERIODIC_TABLE:
            sym = sym.capitalize()
        if sym not in PERIODIC_TABLE:
            raise ValueError(f'unknown element {sym}')
        charge_code = int(ln[36:39]) if len(ln) >= 39 and ln[36:39].strip() else 0
        atom = Atom(atomic_num=PERIODIC_TABLE[sym],
                    formal_charge=_MDL_CHARGE.get(charge_code, 0))
        mol.add_atom(atom)
        coords.append((x, y, z))
    for i in range(nbonds):
        ln = lines[4 + natoms + i]
        a1 = int(ln[0:3]) - 1
        a2 = int(ln[3:6]) - 1
        code = int(ln[6:9])
        order = _MDL_BOND_ORDER.get(code, 1.0)
        mol.add_bond(a1, a2, order=order, is_aromatic=(code == 4))
    # property block: M  CHG overrides
    for ln in lines[4 + natoms + nbonds:]:
        if ln.startswith('M  CHG'):
            parts = ln.split()
            npairs = int(parts[2])
            for p in range(npairs):
                ai = int(parts[3 + 2 * p]) - 1
                mol.atoms[ai].formal_charge = int(parts[4 + 2 * p])
        elif ln.startswith('M  END'):
            break
    mol.conformer = coords
    # drop explicit hydrogens into implicit counts (heavy-atom graph), keeping
    # coordinates only for heavy atoms — matches RemoveHs default behavior.
    h_idx = [i for i, a in enumerate(mol.atoms) if a.atomic_num == 1]
    if h_idx:
        heavy = [i for i, a in enumerate(mol.atoms) if a.atomic_num != 1]
        # implicit-H perception on the stripped graph restores the totals
        sub = mol.subgraph(heavy)
        sub.conformer = [coords[i] for i in heavy]
        return sub
    return mol.finalize()


def parse_sdf(text: str) -> Iterator[Tuple[Optional[Molecule], Dict[str, str]]]:
    """Iterate (molecule, properties) records from SDF text."""
    for idx, record in enumerate(text.split('$$$$')):
        # after a $$$$ separator, remove exactly its trailing newline —
        # a blanket strip('\n') would eat an EMPTY TITLE LINE and shift
        # the molblock header by one row (common in generated SDFs)
        if idx > 0:
            if record.startswith('\r\n'):
                record = record[2:]
            elif record.startswith('\n'):
                record = record[1:]
        record = record.rstrip('\n')
        if not record.strip():
            continue
        if 'M  END' in record:
            mol_part, _, prop_part = record.partition('M  END')
            mol = mol_from_molblock(mol_part + 'M  END')
        else:
            mol, prop_part = None, record
        props: Dict[str, str] = {}
        key = None
        buf: List[str] = []
        for ln in prop_part.split('\n'):
            if ln.startswith('>'):
                if key is not None:
                    props[key] = '\n'.join(buf).strip()
                l, r = ln.find('<'), ln.rfind('>')
                key = ln[l + 1:r] if 0 <= l < r else None
                buf = []
            elif key is not None:
                buf.append(ln)
        if key is not None:
            props[key] = '\n'.join(buf).strip()
        yield mol, props


def mol_to_molblock(mol, name: str = '') -> str:
    """Write a V2000 molblock (counterpart of mol_from_molblock; the
    reference uses RDKit MolToMolBlock)."""
    from .mol import ATOMIC_SYMBOL
    coords = mol.conformer
    if coords is None:
        from deepchem_tpu.utils.conformers import embed_molecule_3d
        coords = [(float(x), float(y), float(z))
                  for x, y, z in embed_molecule_3d(mol)]
    lines = [name, '     dctpu          3D', '',
             f'{mol.num_atoms:3d}{mol.num_bonds:3d}  0  0  0  0  0  0  0  0999 V2000']
    for atom, (x, y, z) in zip(mol.atoms, coords):
        sym = ATOMIC_SYMBOL.get(atom.atomic_num, '*')
        lines.append(f'{x:10.4f}{y:10.4f}{z:10.4f} {sym:<3s} 0  0  0  0  0'
                     '  0  0  0  0  0  0  0')
    rev = {1.0: 1, 2.0: 2, 3.0: 3, 1.5: 4}
    for b in mol.bonds:
        code = rev.get(b.order, 1)
        lines.append(f'{b.a1 + 1:3d}{b.a2 + 1:3d}{code:3d}  0')
    charged = [(i + 1, a.formal_charge)
               for i, a in enumerate(mol.atoms) if a.formal_charge]
    if charged:
        parts = ' '.join(f'{i:3d} {c:3d}' for i, c in charged)
        lines.append(f'M  CHG{len(charged):3d} {parts}')
    lines.append('M  END')
    return '\n'.join(lines) + '\n'


def write_sdf(path: str, mols, properties=None) -> None:
    """Write molecules (+ per-mol property dicts) to an SDF file."""
    with open(path, 'w') as f:
        for i, mol in enumerate(mols):
            f.write(mol_to_molblock(mol))
            if properties is not None and i < len(properties):
                for k, v in properties[i].items():
                    f.write(f'>  <{k}>\n{v}\n\n')
            f.write('$$$$\n')
