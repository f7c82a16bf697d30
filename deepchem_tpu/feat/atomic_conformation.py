"""AtomicConformation container + featurizer (reference
deepchem/feat/atomic_conformation.py:8,115).

The reference builds these with RDKit (file loading, ETKDG conformer
embedding, Gasteiger charges); here the same pipeline runs on the
in-repo chem core: ``chem.smiles`` parsing, ``utils.conformers``
3D embedding, and ``chem.gasteiger`` PEOE charges.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from deepchem_tpu.feat.base import Featurizer

STANDARD_PROPERTIES = ['atomic number', 'formal charge', 'partial charge']


class AtomicConformation:
    """A collection of atoms in 3D space with per-atom scalar properties
    (reference atomic_conformation.py:8).

    Attributes
    ----------
    positions: (N, 3) float array, angstroms
    properties: (N, M) float array
    property_names: (M,) array of names
    """

    def __init__(self, positions: np.ndarray, properties: np.ndarray,
                 property_names: Sequence[str]):
        self.positions = np.asarray(positions, dtype=np.float64)
        self.properties = np.asarray(properties, dtype=np.float64)
        self.property_names = np.array(property_names)

    @property
    def num_atoms(self) -> int:
        """The number of atoms in this object."""
        return self.positions.shape[0]

    def get_property(self, name: str) -> np.ndarray:
        """One column of the properties array, by property name."""
        indices = np.where(self.property_names == name)[0]
        if len(indices) == 0:
            raise ValueError("No property called '%s'" % name)
        return self.properties[:, indices[0]]

    @property
    def atomic_number(self) -> np.ndarray:
        return self.get_property('atomic number')

    @property
    def formal_charge(self) -> np.ndarray:
        return self.get_property('formal charge')

    @property
    def partial_charge(self) -> np.ndarray:
        return self.get_property('partial charge')


class AtomicConformationFeaturizer(Featurizer):
    """Featurize each datapoint string into an AtomicConformation
    (reference atomic_conformation.py:115).

    A datapoint ending in ``.pdb`` or ``.sdf`` is read as that file
    format (all molecules / atoms contained); anything else is parsed
    as SMILES, hydrogen-completed, and embedded in 3D.  Formal charges
    come from the connection table; partial charges from the in-repo
    Gasteiger PEOE (``chem/gasteiger.py``).  ``.mol2`` needs a
    Tripos parser that is not implemented.
    """

    def _featurize(self, datapoint: str, **kwargs) -> AtomicConformation:
        from deepchem_tpu.chem.gasteiger import compute_gasteiger_charges
        positions = []
        properties = []

        def _add_mol(mol, coords):
            qh, qimp = compute_gasteiger_charges(mol)
            n_heavy = len(mol.atoms)
            coords = np.asarray(coords, dtype=np.float64)
            if len(coords) != n_heavy:
                raise ValueError('conformer/atom-count mismatch')
            for i, a in enumerate(mol.atoms):
                positions.append(coords[i])
                # heavy atom: PEOE charge of the atom itself; its
                # implicit hydrogens are folded in (H positions are
                # not in the H-suppressed connection table)
                properties.append([a.atomic_num, a.formal_charge,
                                   qh[i] + qimp[i]])

        if datapoint.endswith('.pdb'):
            from deepchem_tpu.utils.pdbqt_utils import \
                load_pdb_coordinates
            from deepchem_tpu.chem.mol import PERIODIC_TABLE
            coords, elements = load_pdb_coordinates(datapoint)
            for xyz, el in zip(coords, elements):
                z = PERIODIC_TABLE.get(el.capitalize(), 0)
                positions.append(np.asarray(xyz, dtype=np.float64))
                # bond-less PDB records: formal/partial charge unknown
                properties.append([z, 0.0, 0.0])
        elif datapoint.endswith('.sdf'):
            from deepchem_tpu.chem.sdf import parse_sdf
            with open(datapoint) as f:
                text = f.read()
            for mol, _props in parse_sdf(text):
                if mol is None or mol.conformer is None:
                    continue
                _add_mol(mol, mol.conformer)
        elif datapoint.endswith('.mol2'):
            raise NotImplementedError(
                'Tripos .mol2 parsing is not implemented in this build')
        else:
            from deepchem_tpu.chem.smiles import mol_from_smiles
            from deepchem_tpu.utils.conformers import embed_molecule_3d
            mol = mol_from_smiles(datapoint)
            coords = embed_molecule_3d(mol)
            _add_mol(mol, coords)

        return AtomicConformation(
            np.asarray(positions).reshape(-1, 3),
            np.asarray(properties).reshape(-1, 3),
            STANDARD_PROPERTIES)
