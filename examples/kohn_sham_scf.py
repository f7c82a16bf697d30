"""Differentiable Kohn-Sham DFT: classical functionals + training a
neural XC functional THROUGH the SCF loop (reference XCNNSCF workflow).

Run: python examples/kohn_sham_scf.py
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from deepchem_tpu.dft import (DFTSystem, KohnShamSCF, XCNNSCF, NNLDA,
                              DFTEntry)

jax.config.update('jax_enable_x64', True)

# 1. classical SCF on water
ang = np.pi / 180 * 104.52
r = 0.9572
coords = np.array([[0, 0, 0], [r, 0, 0],
                   [r * np.cos(ang), r * np.sin(ang), 0]])
h2o = DFTSystem(['O', 'H', 'H'], coords, units='angstrom')
for xc in ('hf', 'lda', 'pbe'):
    print(f'H2O {xc.upper():4s}: {float(KohnShamSCF(xc=xc).run(h2o).energy()):.6f} Ha')

# 2. atomization energy via a DFT entry (unrestricted atoms)
entry = DFTEntry('ae', 0.1835, [{'moldesc': 'H 0 0 0; H 0 0 1.4'}])
print(f'H2 atomization (HF): {entry.compute("hf"):.4f} Ha (true 0.1835)')

# 3. train a neural XC functional through the SCF to hit a target energy
h2 = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]], units='bohr',
               n_radial=40, grid_level=1)
nn = NNLDA(hidden=(16,))
params = nn.init(jax.random.PRNGKey(0), np.ones(4))
scf = XCNNSCF(nn, params, iterations=25)
efn = jax.jit(scf.energy_fn(h2))
target = -1.17447   # exact H2 energy (Kolos-Wolniewicz)
opt = optax.adam(3e-3)
state = opt.init(params)

@jax.jit
def step(params, state):
    loss, g = jax.value_and_grad(
        lambda p: (efn(p) - target) ** 2)(params)
    updates, state = opt.update(g, state)
    return optax.apply_updates(params, updates), state, loss

for i in range(30):
    params, state, loss = step(params, state)
    if i % 10 == 0:
        print(f'  nn-xc step {i}: loss {float(loss):.6f} '
              f'E {float(efn(params)):.5f}')
print(f'final NN-XC H2 energy: {float(efn(params)):.5f} '
      f'(target {target})')
