"""Name-parity layer for the reference's ``deepchem.utils.dft_utils``
API (89 exports, ``/root/reference/deepchem/utils/dft_utils/__init__.py``).

Every name here is backed by REAL in-repo functionality — the native
McMurchie-Davidson integral engine, the jnp SCF/grid/orbparams/PBC
stack under ``deepchem_tpu.dft`` — re-shaped to the reference's calling
conventions.  The reference reaches these capabilities through libcint
and libxc; we reach them through the native engine, so wrapper-specific
names (``LibcintWrapper`` and the raw libxc calculators) raise an
informative ImportError naming the native equivalent instead of
pretending to bind a library that is not there.

Signature note: reference integral functions take a LibcintWrapper;
here they take the same ``List[BasisFunction]`` the native engine uses
(built by :func:`loadbasis` / ``dft.build_basis``).
"""
from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional, Sequence, Union

import numpy as np

from deepchem_tpu.dft import basis as _basislib
from deepchem_tpu.dft import integrals as _ints
from deepchem_tpu.dft.basis import BasisFunction, build_basis
from deepchem_tpu.dft.orbparams import (BaseOrbParams, MatExpOrbParams,
                                        QROrbParams)
from deepchem_tpu.dft.pbc import (Lattice, PBCIntOption,
                                  get_default_kpts,
                                  get_default_options, pbc_eval_gto)
from deepchem_tpu.dft.radial import (BaseGrid, BaseGridTransform,
                                     BaseTruncationRules,
                                     DE2Transformation,
                                     LogM3Transformation, NoTrunc,
                                     NWChemTrunc, RadialGrid,
                                     SlicedRadialGrid,
                                     TreutlerM4Transformation,
                                     angular_quadrature,
                                     get_grid_transform,
                                     get_xw_integration,
                                     pruned_molecular_grid)
from deepchem_tpu.dft.scf import parse_moldesc

# ------------------------------------------------------------- types

AtomZsType = Union[List[str], List[int], np.ndarray]
AtomPosType = Union[List[Sequence[float]], np.ndarray]
BasisInpType = Union[str, List[str]]
ZType = Union[int, float]


def is_z_float(a: ZType) -> bool:
    """True when the atomic number is a float (fractional/alchemical z)
    (reference datastruct.py is_z_float).

    Examples
    --------
    >>> is_z_float(6), is_z_float(6.5)
    (False, True)
    """
    return isinstance(a, float)


class SpinParam:
    """Container of spin-up/-down values (reference datastruct.py:24).

    Examples
    --------
    >>> sp = SpinParam(u=2.0, d=1.0)
    >>> SpinParam.sum(sp)
    3.0
    >>> SpinParam.reduce(sp, lambda a, b: a * b)
    2.0
    >>> SpinParam.apply_fcn(lambda x: x * 10, sp).u
    20.0
    """

    def __init__(self, u, d):
        self.u = u
        self.d = d

    def __repr__(self):
        return f'SpinParam(u={self.u}, d={self.d})'

    @staticmethod
    def sum(a):
        return a.u + a.d if isinstance(a, SpinParam) else a

    @staticmethod
    def reduce(a, fcn: Callable):
        return fcn(a.u, a.d) if isinstance(a, SpinParam) else a

    @staticmethod
    def apply_fcn(fcn: Callable, *a):
        if isinstance(a[0], SpinParam):
            return SpinParam(u=fcn(*[x.u for x in a]),
                             d=fcn(*[x.d for x in a]))
        return fcn(*a)


class ValGrad:
    """Density value + optional gradient/laplacian/kinetic channels
    (reference datastruct.py:88); closed under + and scalar *.

    Examples
    --------
    >>> import numpy as np
    >>> a = ValGrad(np.ones(3), grad=np.ones((3, 3)))
    >>> b = (a + a) * 2.0
    >>> float(b.value[0]), float(b.grad[0, 0])
    (4.0, 4.0)
    """

    def __init__(self, value, grad=None, lapl=None, kin=None):
        self.value = value
        self.grad = grad
        self.lapl = lapl
        self.kin = kin

    def __add__(self, b: 'ValGrad') -> 'ValGrad':
        pick = lambda x, y: x + y if x is not None else None  # noqa: E731
        return ValGrad(self.value + b.value, pick(self.grad, b.grad),
                       pick(self.lapl, b.lapl), pick(self.kin, b.kin))

    def __mul__(self, f) -> 'ValGrad':
        pick = lambda x: x * f if x is not None else None  # noqa: E731
        return ValGrad(self.value * f, pick(self.grad),
                       pick(self.lapl), pick(self.kin))


@dataclass
class CGTOBasis:
    """One contracted shell: angular momentum + primitives (reference
    api/loadbasis.py CGTOBasis)."""
    angmom: int
    alphas: np.ndarray
    coeffs: np.ndarray
    normalized: bool = True


@dataclass
class AtomCGTOBasis:
    """All shells of one atom at a position (reference datastruct.py
    AtomCGTOBasis)."""
    atomz: ZType
    bases: List[CGTOBasis]
    pos: Sequence[float] = field(default_factory=lambda: (0., 0., 0.))


_ANGMOM = {'S': 0, 'P': 1, 'D': 2, 'F': 3}


def loadbasis(cmd: str, dtype=np.float64) -> List[CGTOBasis]:
    """Load the shells of one element: ``loadbasis('<z>:<basis>')``
    (reference api/loadbasis.py contract, backed by the in-repo basis
    tables instead of downloaded BSE files).

    Examples
    --------
    >>> shells = loadbasis('8:sto-3g')
    >>> [s.angmom for s in shells]
    [0, 0, 1]
    """
    zstr, basis_name = cmd.split(':')
    z = int(zstr)
    sym = [k for k, v in _ATOM_Z.items() if v == z]
    if not sym:
        raise ValueError(f'no element with z={z}')
    table = _basislib.BASIS_SETS.get(basis_name.strip().lower())
    if table is None:
        raise ValueError(f'unknown basis {basis_name!r} (available: '
                         f'{sorted(_basislib.BASIS_SETS)})')
    shells_raw = table.get(sym[0])
    if shells_raw is None:
        raise ValueError(f'no {basis_name!r} data for z={z}')
    out: List[CGTOBasis] = []
    for shell in shells_raw:
        kind, exps = shell[0], np.asarray(shell[1], dtype=dtype)
        if kind == 'SP':
            cs, cp = shell[2], shell[3]
            out.append(CGTOBasis(0, exps, np.asarray(cs, dtype=dtype)))
            out.append(CGTOBasis(1, exps, np.asarray(cp, dtype=dtype)))
        else:
            out.append(CGTOBasis(_ANGMOM[kind], exps,
                                 np.asarray(shell[2], dtype=dtype)))
    return out


_ATOM_Z = {'H': 1, 'He': 2, 'Li': 3, 'Be': 4, 'B': 5, 'C': 6, 'N': 7,
           'O': 8, 'F': 9, 'Ne': 10, 'Na': 11, 'Mg': 12, 'Al': 13,
           'Si': 14, 'P': 15, 'S': 16, 'Cl': 17, 'Ar': 18}


# ------------------------------------------------------ XC objects

class BaseXC:
    """Composable exchange-correlation functional: wraps an energy
    density e(rho[, sigma[, tau]]) and supports ``a + b`` and
    ``a * 0.2`` like the reference's xc/base_xc.py algebra."""

    def __init__(self, fn: Callable, family: int = 1,
                 name: str = 'custom'):
        self.fn = fn
        self.family = family      # 1 = LDA, 2 = GGA, 4 = MGGA
        self.name = name

    def get_edensityxc(self, *densinfo):
        return self.fn(*densinfo)

    def __call__(self, *densinfo):
        return self.fn(*densinfo)

    def __add__(self, other: 'BaseXC') -> 'BaseXC':
        return AddBaseXC(self, other)

    def __mul__(self, f: float) -> 'BaseXC':
        return MulBaseXC(self, f)

    __rmul__ = __mul__


class AddBaseXC(BaseXC):
    """Sum of two functionals (reference base_xc.py AddBaseXC)."""

    def __init__(self, a: BaseXC, b: BaseXC):
        self.a, self.b = a, b
        family = max(a.family, b.family)
        super().__init__(self._fn, family, f'{a.name}+{b.name}')

    def _fn(self, *densinfo):
        def call(xc):
            n = {1: 1, 2: 2, 4: 3}[xc.family]
            return xc.fn(*densinfo[:n])
        return call(self.a) + call(self.b)


class MulBaseXC(BaseXC):
    """Scalar-scaled functional (reference base_xc.py MulBaseXC)."""

    def __init__(self, a: BaseXC, f: float):
        self.a, self.f = a, f
        super().__init__(lambda *d: a.fn(*d) * f, a.family,
                         f'{f}*{a.name}')


def get_xc(name: str) -> BaseXC:
    """Resolve an XC functional by name to the NATIVE implementations
    (reference xc/getxc.py resolves via libxc; same names, in-repo
    physics — dft/functionals.py).

    Examples
    --------
    >>> import numpy as np
    >>> xc = get_xc('lda_x')
    >>> e = xc(np.array([1.0]))   # energy density at rho=1
    >>> round(float(e[0]), 6)
    -0.738559
    """
    from deepchem_tpu.dft import functionals as F
    s = name.lower().replace('gga_x_', '').replace('gga_c_', '') \
        .replace('lda_x', 'ldax').replace('lda_c_', '')
    table = {
        # in-repo functionals return the PER-VOLUME energy density
        # e(rho) with sum(w * e) = Exc (dft/scf.py _exc_energy)
        'ldax': BaseXC(F.lda_exchange, 1, 'lda_x'),
        'vwn': BaseXC(F.lda_correlation_vwn, 1, 'lda_c_vwn'),
        'lda': BaseXC(F.lda_xc, 1, 'lda'),
        'svwn': BaseXC(F.lda_xc, 1, 'svwn'),
        'pbe': BaseXC(F.pbe_xc, 2, 'pbe'),
        'b3lyp': BaseXC(F.b3lyp_xc, 2, 'b3lyp'),
        'blyp': BaseXC(F.blyp_xc, 2, 'blyp'),
        'pbe0': BaseXC(F.pbe0_xc, 2, 'pbe0'),
        'scan': BaseXC(F.scan_xc, 4, 'scan'),
    }
    if s in table:
        return table[s]
    raise ValueError(f'unknown xc {name!r} (native set: '
                     f'{sorted(table)})')


def _libxc_gate(*_, **__):
    raise ImportError(
        'libxc is not bound in this framework; the functionals are '
        'implemented natively — use deepchem_tpu.utils.dft_utils.get_xc '
        'or deepchem_tpu.dft.functionals')


class LibXCLDA:          # pragma: no cover - gate
    def __init__(self, *a, **k):
        _libxc_gate()


class LibXCGGA(LibXCLDA):
    pass


class LibXCMGGA(LibXCLDA):
    pass


CalcLDALibXCPol = CalcLDALibXCUnpol = _libxc_gate
CalcGGALibXCPol = CalcGGALibXCUnpol = _libxc_gate
CalcMGGALibXCPol = CalcMGGALibXCUnpol = _libxc_gate
get_libxc = _libxc_gate


class LibcintWrapper:    # pragma: no cover - gate
    def __init__(self, *a, **k):
        raise ImportError(
            'libcint is not bound in this framework; integrals come '
            'from the native McMurchie-Davidson engine '
            '(deepchem_tpu.dft.integrals, C++ fast path in '
            'deepchem_tpu/native)')


SubsetLibcintWrapper = LibcintWrapper


# ------------------------------------------------- integral adapters

def overlap(basis: List[BasisFunction]) -> np.ndarray:
    """<i|j> (reference intor int1e('ovlp'))."""
    return _ints.overlap_matrix(basis)


def kinetic(basis: List[BasisFunction]) -> np.ndarray:
    """<i|-0.5 nabla^2|j>."""
    return _ints.kinetic_matrix(basis)


def nuclattr(basis: List[BasisFunction], charges: Sequence[int],
             coords: np.ndarray) -> np.ndarray:
    """Nuclear-attraction matrix."""
    return _ints.nuclear_matrix(basis, charges, np.asarray(coords))


def elrep(basis: List[BasisFunction]) -> np.ndarray:
    """Two-electron repulsion tensor (ij|kl)."""
    return _ints.eri_tensor(basis)


int2e = elrep


def int1e(shortname: str, basis: List[BasisFunction],
          charges: Optional[Sequence[int]] = None,
          coords: Optional[np.ndarray] = None) -> np.ndarray:
    """One-electron integral dispatcher (reference intor int1e):
    'ovlp', 'kin', 'nuc', or 'r0' (dipole)."""
    if shortname == 'ovlp':
        return overlap(basis)
    if shortname == 'kin':
        return kinetic(basis)
    if shortname == 'nuc':
        if charges is None or coords is None:
            raise ValueError("int1e('nuc') needs charges and coords")
        return nuclattr(basis, charges, coords)
    if shortname == 'r0':
        from deepchem_tpu.dft.posthf import dipole_integrals
        return dipole_integrals(basis)
    raise ValueError(f'unknown int1e {shortname!r}')


def coul2c(aux_basis: List[BasisFunction]) -> np.ndarray:
    """(P|Q) two-center Coulomb metric (reference intor int2c2e)."""
    from deepchem_tpu.dft.df import ri_tensors
    _, V = ri_tensors(aux_basis[:1], aux_basis)
    return V


def coul3c(basis: List[BasisFunction],
           aux_basis: List[BasisFunction]) -> np.ndarray:
    """(ij|P) three-center Coulomb factors (reference intor int3c2e)."""
    from deepchem_tpu.dft.df import ri_tensors
    B, _ = ri_tensors(basis, aux_basis)
    return B


int2c2e = coul2c
int3c2e = coul3c


# --------------------------------------------------- GTO evaluation

def eval_gto(basis: List[BasisFunction],
             points: np.ndarray) -> np.ndarray:
    """AO values on points, [nao, G] (reference gtoeval.py layout)."""
    phi, _ = _ints.ao_values(basis, points)
    return phi.T


def eval_gradgto(basis: List[BasisFunction],
                 points: np.ndarray) -> np.ndarray:
    """AO gradients, [3, nao, G]."""
    _, dphi = _ints.ao_values(basis, points)   # [G, 3, n]
    return np.transpose(dphi, (1, 2, 0))


def eval_laplgto(basis: List[BasisFunction],
                 points: np.ndarray) -> np.ndarray:
    """AO laplacians, [nao, G]: analytic nabla^2 of each contracted
    cartesian Gaussian (d^2/dx^2 of x^l e^(-a r^2) = l(l-1)x^(l-2)e
    - 2a(2l+1) x^l e + 4a^2 x^(l+2) e, summed over dimensions)."""
    pts = np.asarray(points, dtype=np.float64)
    G, n = len(pts), len(basis)
    out = np.zeros((n, G))
    for j, bf in enumerate(basis):
        d = pts - np.asarray(bf.center)[None, :]
        r2 = np.einsum('ga,ga->g', d, d)
        lmn = np.asarray(bf.lmn)
        mono = d[:, 0] ** lmn[0] * d[:, 1] ** lmn[1] * d[:, 2] ** lmn[2]
        for a, c in zip(bf.exps, bf.coefs):
            e = c * np.exp(-a * r2)
            lap = np.zeros(G)
            for dim in range(3):
                ld = int(lmn[dim])
                others = mono / np.where(d[:, dim] ** ld == 0.0, 1.0,
                                         d[:, dim] ** ld) \
                    if ld else mono
                # recompute monomial without dim robustly
                idx = [0, 1, 2]
                idx.remove(dim)
                others = d[:, idx[0]] ** int(lmn[idx[0]]) \
                    * d[:, idx[1]] ** int(lmn[idx[1]])
                x = d[:, dim]
                term = (ld * (ld - 1) * x ** max(ld - 2, 0)
                        - 2.0 * a * (2 * ld + 1) * x ** ld
                        + 4.0 * a * a * x ** (ld + 2))
                lap += others * term
            out[j] += lap * e
    return out


def gto_evaluator(basis: List[BasisFunction], shortname: str,
                  points: np.ndarray) -> np.ndarray:
    """Dispatcher (reference gtoeval.py gto_evaluator)."""
    if shortname == '':
        return eval_gto(basis, points)
    if shortname == 'ip':
        return eval_gradgto(basis, points)
    if shortname == 'lapl':
        return eval_laplgto(basis, points)
    raise ValueError(f'unknown gto evaluator {shortname!r}')


evl = gto_evaluator


def pbc_eval_gradgto(basis, lattice: Lattice, points: np.ndarray,
                     kpts: Optional[np.ndarray] = None,
                     options: Optional[PBCIntOption] = None
                     ) -> np.ndarray:
    """Bloch-summed AO gradients [nk, 3, nao, G]."""
    from deepchem_tpu.dft.pbc import _basis_rcut
    opt = get_default_options(options)
    kpts = get_default_kpts(kpts)
    pts = np.asarray(points, dtype=np.float64)
    ls = lattice.get_lattice_ls(_basis_rcut(basis, lattice,
                                            opt.precision))
    out = np.zeros((len(kpts), 3, len(basis), len(pts)),
                   dtype=np.complex128)
    for L in ls:
        g = eval_gradgto(basis, pts - L[None, :])    # [3, nao, G]
        phase = np.exp(1j * kpts @ L)
        out += phase[:, None, None, None] * g[None]
    return out.real if np.allclose(kpts, 0.0) else out


def pbc_eval_laplgto(basis, lattice: Lattice, points: np.ndarray,
                     kpts: Optional[np.ndarray] = None,
                     options: Optional[PBCIntOption] = None
                     ) -> np.ndarray:
    """Bloch-summed AO laplacians [nk, nao, G]."""
    from deepchem_tpu.dft.pbc import _basis_rcut
    opt = get_default_options(options)
    kpts = get_default_kpts(kpts)
    pts = np.asarray(points, dtype=np.float64)
    ls = lattice.get_lattice_ls(_basis_rcut(basis, lattice,
                                            opt.precision))
    out = np.zeros((len(kpts), len(basis), len(pts)),
                   dtype=np.complex128)
    for L in ls:
        g = eval_laplgto(basis, pts - L[None, :])
        phase = np.exp(1j * kpts @ L)
        out += phase[:, None, None] * g[None]
    return out.real if np.allclose(kpts, 0.0) else out


def pbc_evl(basis, lattice, shortname: str, points, kpts=None):
    """PBC evaluation dispatcher."""
    if shortname == '':
        return pbc_eval_gto(basis, lattice, points, kpts)
    if shortname == 'ip':
        return pbc_eval_gradgto(basis, lattice, points, kpts)
    if shortname == 'lapl':
        return pbc_eval_laplgto(basis, lattice, points, kpts)
    raise ValueError(f'unknown pbc evaluator {shortname!r}')


# ---------------------------------------------------------- grids

class BeckeGrid(BaseGrid):
    """Becke-stitched molecular grid as a BaseGrid (reference
    grid/multiatoms_grid.py BeckeGrid; built on dft/grid.py)."""

    def __init__(self, symbols: Sequence[str], coords: np.ndarray,
                 n_radial: int = 50, level: int = 2):
        from deepchem_tpu.dft.grid import molecular_grid
        pts, wts = molecular_grid(symbols, np.asarray(coords,
                                                      dtype=np.float64),
                                  n_radial=n_radial, level=level)
        self._pts, self._wts = pts, wts

    def get_rgrid(self) -> np.ndarray:
        return self._pts

    def get_dvolume(self) -> np.ndarray:
        return self._wts


class PBCBeckeGrid(BaseGrid):
    """Becke grid of one unit cell: points folded into the cell, the
    cell's volume integral preserved (reference grid/
    multiatoms_grid.py PBCBeckeGrid scope)."""

    def __init__(self, symbols: Sequence[str], coords: np.ndarray,
                 lattice: Lattice, n_radial: int = 40,
                 level: int = 2):
        from deepchem_tpu.dft.grid import molecular_grid
        pts, wts = molecular_grid(symbols, np.asarray(coords,
                                                      dtype=np.float64),
                                  n_radial=n_radial, level=level)
        # fold into the home cell: r -> r - a @ floor(frac(r))
        a = lattice.lattice_vectors()
        frac = pts @ np.linalg.inv(a)
        self._pts = (frac - np.floor(frac)) @ a
        self._wts = wts
        self.lattice = lattice

    def get_rgrid(self) -> np.ndarray:
        return self._pts

    def get_dvolume(self) -> np.ndarray:
        return self._wts


class LebedevGrid(BaseGrid):
    """Atom-centered radial x angular product grid of a given angular
    exactness degree (reference grid/lebedev_grid.py LebedevGrid; the
    angular rule here is the exactness-matched Gauss-product
    quadrature from dft/radial.py rather than Lebedev-Laikov points —
    same degree guarantee, closed-form construction)."""

    def __init__(self, radgrid: RadialGrid, prec: int = 13):
        ang_pts, ang_wts = angular_quadrature(prec)
        r = radgrid.get_rgrid()[:, 0]
        dv = radgrid.get_dvolume()
        self._pts = (r[:, None, None]
                     * ang_pts[None, :, :]).reshape(-1, 3)
        self._wts = (dv[:, None] * ang_wts[None, :]).reshape(-1)

    def get_rgrid(self) -> np.ndarray:
        return self._pts

    def get_dvolume(self) -> np.ndarray:
        return self._wts


class TruncatedLebedevGrid(LebedevGrid):
    """Concatenation of per-zone LebedevGrids (reference
    lebedev_grid.py TruncatedLebedevGrid): build with a list of radial
    slices and matching precisions."""

    def __init__(self, radgrids: Sequence[RadialGrid],
                 precs: Sequence[int]):
        assert len(radgrids) == len(precs)
        subs = [LebedevGrid(rg, p) for rg, p in zip(radgrids, precs)]
        self._pts = np.concatenate([s.get_rgrid() for s in subs])
        self._wts = np.concatenate([s.get_dvolume() for s in subs])


def LebedevLoader(prec: int):
    """Angular points/weights at an exactness degree (reference
    lebedev_grid.py LebedevLoader reads Lebedev-Laikov tables; here the
    closed-form product rule of the same degree)."""
    return angular_quadrature(prec)


def get_grid(symbols: Sequence[str], coords: np.ndarray,
             grid: Union[int, str] = 3) -> BaseGrid:
    """Molecular-grid factory (reference grid/factory.py get_grid):
    accepts a coarseness int (0-4) or 'sg2'/'sg3'."""
    if isinstance(grid, str):
        grid = {'sg2': 2, 'sg3': 4}[grid.lower()]
    n_radial = [30, 40, 50, 75, 99][int(grid)]
    level = [1, 2, 2, 3, 3][int(grid)]
    return BeckeGrid(symbols, coords, n_radial=n_radial, level=level)


get_predefined_grid = get_grid


class DasguptaTrunc(BaseTruncationRules):
    """Dasgupta-Herbert per-element pruning schedules for 75- and
    99-point radial grids (J. Comput. Chem. 38, 869 (2017), Tables
    published therein; reference truncation_rules.py carries the same
    data).  Unlisted elements fall back to no truncation."""

    _IDX = {
        75: {1: [0, 35, 47, 63, 70, 75], 8: [0, 30, 44, 62, 70, 75],
             6: [0, 35, 47, 64, 71, 75], 7: [0, 35, 47, 64, 71, 75],
             9: [0, 26, 42, 61, 69, 75]},
        99: {1: [0, 45, 61, 82, 92, 99], 7: [0, 40, 58, 82, 93, 99],
             6: [0, 46, 62, 84, 93, 99]},
    }
    _PRECS = {
        75: {1: [3, 17, 29, 15, 7], 8: [3, 17, 29, 19, 11],
             6: [3, 17, 29, 19, 7], 7: [3, 17, 29, 15, 7],
             9: [3, 17, 29, 17, 11]},
        99: {1: [3, 17, 41, 23, 11], 7: [3, 17, 41, 19, 11],
             6: [3, 17, 41, 19, 11]},
    }

    def __init__(self, nr: Union[int, Callable[[int], int]]):
        self._nr = nr

    def _nr_of(self, atz: int) -> int:
        return self._nr(atz) if callable(self._nr) else self._nr

    def to_truncate(self, atz: int) -> bool:
        nr = self._nr_of(atz)
        return nr in self._IDX and atz in self._IDX[nr]

    def rad_slices(self, atz: int, radgrid: RadialGrid) -> List[slice]:
        idxs = self._IDX[self._nr_of(atz)][atz]
        return [slice(a, b) for a, b in zip(idxs[:-1], idxs[1:])]

    def precs(self, atz: int, radgrid: RadialGrid) -> List[int]:
        return list(self._PRECS[self._nr_of(atz)][atz])


# ------------------------------------------------- system / engines

class BaseSystem:
    """System contract (reference system/base_system.py): atoms +
    basis + grid accessors."""

    def get_nuclei_energy(self) -> float:
        raise NotImplementedError

    def requires_grid(self) -> bool:
        return True


class Mol(BaseSystem):
    """Molecule described by a moldesc string (reference system/mol.py
    Mol('H -1 0 0; H 1 0 0', basis='sto-3g'); coordinates in BOHR).
    Thin construction adapter over dft.DFTSystem.

    Examples
    --------
    >>> m = Mol('H 0 0 0; H 0 0 1.4', basis='sto-3g')
    >>> m.system.n_elec
    2
    """

    def __init__(self, moldesc: str, basis: str = 'sto-3g',
                 charge: int = 0, spin: Optional[int] = None,
                 **kwargs):
        from deepchem_tpu.dft import DFTSystem
        symbols, coords = parse_moldesc(moldesc)
        self.spin = spin
        self.system = DFTSystem(symbols, coords, charge=charge,
                                units='bohr', basis=basis, **kwargs)

    def get_nuclei_energy(self) -> float:
        return float(self.system.e_nuc)

    @property
    def atompos(self) -> np.ndarray:
        return self.system.coords

    @property
    def atomzs(self) -> List[int]:
        return list(self.system.charges)


class BaseQCCalc:
    """QC-calculation contract (reference qccalc/base_qccalc.py)."""

    def run(self, **kwargs) -> 'BaseQCCalc':
        raise NotImplementedError

    def energy(self):
        raise NotImplementedError

    def aodm(self):
        raise NotImplementedError


class SCF_QCCalc(BaseQCCalc):
    """SCF result wrapper: run() drives the native solver, energy()
    and aodm() expose the reference accessors (reference
    qccalc/scf_qccalc.py)."""

    def __init__(self, engine: 'BaseSCFEngine'):
        self._engine = engine
        self._calc = None

    def run(self, **kwargs) -> 'SCF_QCCalc':
        self._calc = self._engine._run(**kwargs)
        return self

    def energy(self):
        assert self._calc is not None, 'call run() first'
        return self._calc.energy()

    def aodm(self):
        assert self._calc is not None, 'call run() first'
        return self._calc.D


class BaseSCFEngine:
    """SCF engine contract (reference qccalc/scf_qccalc.py
    SCFEngine)."""

    def _run(self, **kwargs):
        raise NotImplementedError


class KSEngine(BaseSCFEngine):
    def __init__(self, mol: Mol, xc: str = 'lda', **kwargs):
        from deepchem_tpu.dft import KohnShamSCF
        self._mol = mol
        self._ks = KohnShamSCF(xc=xc, **kwargs)

    def _run(self, **kwargs):
        if self._mol.spin:
            from deepchem_tpu.dft.scf import run_unrestricted
            raise NotImplementedError(
                'open-shell KS: use deepchem_tpu.dft.run_unrestricted')
        return self._ks.run(self._mol.system)


class HFEngine(KSEngine):
    def __init__(self, mol: Mol, **kwargs):
        super().__init__(mol, xc='hf', **kwargs)


def KS(mol: Mol, xc: str = 'lda', **kwargs) -> SCF_QCCalc:
    """Kohn-Sham calculation on a Mol (reference qccalc/ks.py KS):
    ``KS(mol, xc='pbe').run().energy()``.

    Examples
    --------
    >>> e = KS(Mol('H 0 0 0; H 0 0 1.4'), xc='hf').run().energy()
    >>> abs(float(e) - -1.11671) < 1e-3   # RHF/STO-3G H2 (literature)
    True
    """
    return SCF_QCCalc(KSEngine(mol, xc=xc, **kwargs))


def HF(mol: Mol, **kwargs) -> SCF_QCCalc:
    """Hartree-Fock calculation on a Mol (reference qccalc/hf.py)."""
    return SCF_QCCalc(HFEngine(mol, **kwargs))


# ------------------------------------------------------ hamiltonian

class BaseHamilton:
    """Hamiltonian contract (reference hamilton/base_hamilton.py):
    integral accessors over one basis."""

    def get_kinnucl(self):
        raise NotImplementedError

    def get_overlap(self):
        raise NotImplementedError

    def get_elrep(self):
        raise NotImplementedError


class HamiltonCGTO(BaseHamilton):
    """Contracted-GTO Hamiltonian over the native engine (reference
    hamilton/hcgto.py).

    Examples
    --------
    >>> m = Mol('H 0 0 0; H 0 0 1.4')
    >>> h = HamiltonCGTO(m)
    >>> h.get_overlap().shape
    (2, 2)
    """

    def __init__(self, mol: Mol):
        self._sys = mol.system

    def get_kinnucl(self) -> np.ndarray:
        return np.asarray(self._sys.T + self._sys.V)

    def get_overlap(self) -> np.ndarray:
        return np.asarray(self._sys.S)

    def get_elrep(self) -> np.ndarray:
        return np.asarray(self._sys.eri)

    def ao_orb2dm(self, orb: np.ndarray, occ: np.ndarray) -> np.ndarray:
        """Density matrix from orbitals + occupations."""
        return (orb * np.asarray(occ)[None, :]) @ orb.T


class OrbitalOrthogonalizer:
    """Symmetric (Lowdin) orthogonalization X = S^(-1/2) restricted to
    the well-conditioned subspace (reference hamilton/orbconverter.py).

    Examples
    --------
    >>> import numpy as np
    >>> S = np.array([[1.0, 0.5], [0.5, 1.0]])
    >>> X = OrbitalOrthogonalizer(S).convert_ortho()
    >>> np.allclose(X.T @ S @ X, np.eye(2))
    True
    """

    def __init__(self, S: np.ndarray, threshold: float = 1e-6):
        w, U = np.linalg.eigh(np.asarray(S))
        keep = w > threshold
        self._X = U[:, keep] * (w[keep] ** -0.5)[None, :]

    def convert_ortho(self) -> np.ndarray:
        return self._X

    def nao_out(self) -> int:
        return self._X.shape[1]


# --------------------------------------------------- density fitting

@dataclass
class DensityFitInfo:
    """RI configuration (reference df/dfinfo.py)."""
    method: str
    auxbases: Any


class BaseDF:
    """Density-fit contract (reference df/base_df.py)."""

    def build(self) -> 'BaseDF':
        raise NotImplementedError

    def get_j(self, dm: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class DFMol(BaseDF):
    """Molecular RI-J over the native even-tempered auxiliary fit
    (reference df/dfmol.py; backed by dft/df.py).

    Examples
    --------
    >>> m = Mol('H 0 0 0; H 0 0 1.4')
    >>> df = DFMol(m).build()
    >>> D = np.eye(2) * 0.5
    >>> J_exact = np.einsum('ijkl,kl->ij', m.system.eri, D)
    >>> bool(np.abs(df.get_j(D) - J_exact).max() < 1e-2)
    True
    """

    def __init__(self, mol: Mol, dfinfo: Optional[DensityFitInfo] = None):
        self._mol = mol
        self._B = None

    def build(self) -> 'DFMol':
        from deepchem_tpu.dft.df import ri_fit
        self._B, _ = ri_fit(self._mol.system.basis)
        return self

    def get_j(self, dm: np.ndarray) -> np.ndarray:
        assert self._B is not None, 'call build() first'
        c = np.einsum('klp,kl->p', self._B, dm)
        return np.einsum('ijp,p->ij', self._B, c)


# ----------------------------------------------------------- config

@dataclass
class _Config:
    """Global knobs (reference config.py): memory thresholds used by
    chunked integral drivers."""
    THRESHOLD_MEMORY: int = 10 * 1024 ** 3
    CHUNK_MEMORY: int = 16 * 1024 ** 2
    VERBOSE: int = 0


config = _Config()


__all__ = [
    'AddBaseXC', 'AtomCGTOBasis', 'AtomPosType', 'AtomZsType', 'BaseDF',
    'BaseGrid', 'BaseGridTransform', 'BaseHamilton', 'BaseOrbParams',
    'BaseQCCalc', 'BaseSCFEngine', 'BaseSystem', 'BaseTruncationRules',
    'BaseXC', 'BasisInpType', 'BeckeGrid', 'CGTOBasis',
    'CalcGGALibXCPol', 'CalcGGALibXCUnpol', 'CalcLDALibXCPol',
    'CalcLDALibXCUnpol', 'CalcMGGALibXCPol', 'CalcMGGALibXCUnpol',
    'DE2Transformation', 'DFMol', 'DasguptaTrunc', 'DensityFitInfo',
    'HF', 'HFEngine', 'HamiltonCGTO', 'KS', 'KSEngine', 'Lattice',
    'LebedevGrid', 'LebedevLoader', 'LibXCGGA', 'LibXCLDA', 'LibXCMGGA',
    'LibcintWrapper', 'LogM3Transformation', 'MatExpOrbParams', 'Mol',
    'MulBaseXC', 'NWChemTrunc', 'NoTrunc', 'OrbitalOrthogonalizer',
    'PBCBeckeGrid', 'PBCIntOption', 'QROrbParams', 'RadialGrid',
    'SCF_QCCalc', 'SlicedRadialGrid', 'SpinParam',
    'SubsetLibcintWrapper', 'TreutlerM4Transformation',
    'TruncatedLebedevGrid', 'ValGrad', 'ZType', 'config', 'coul2c',
    'coul3c', 'elrep', 'eval_gradgto', 'eval_gto', 'eval_laplgto',
    'evl', 'get_default_kpts', 'get_default_options', 'get_grid',
    'get_grid_transform', 'get_libxc', 'get_predefined_grid', 'get_xc',
    'get_xw_integration', 'gto_evaluator', 'int1e', 'int2c2e', 'int2e',
    'int3c2e', 'is_z_float', 'kinetic', 'loadbasis', 'nuclattr',
    'overlap', 'parse_moldesc', 'pbc_eval_gradgto', 'pbc_eval_gto',
    'pbc_eval_laplgto', 'pbc_evl',
]
