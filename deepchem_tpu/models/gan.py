"""Generative adversarial networks (reference deepchem/models/gan.py:11
GAN, :462 WGAN; torch port torch_models/gan.py).

The harness keeps the reference API: subclasses (or constructor callables)
define generator/discriminator; ``fit_gan(batches)`` alternates jitted
generator/discriminator steps; ``predict_gan_generator`` samples.
Conditional inputs are supported by concatenation.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Dict, Iterable, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from deepchem_tpu.models.base import Model
from deepchem_tpu.models.optimizers import Adam, Optimizer

logger = logging.getLogger(__name__)


class GAN(Model):
    """Generative Adversarial Network harness (reference gan.py:11).

    Subclasses override ``get_noise_input_shape``, ``get_data_input_shapes``,
    optionally ``get_conditional_input_shapes``, and ``create_generator`` /
    ``create_discriminator`` returning flax Modules.
    """

    def __init__(self, gradient_penalty: float = 0.0,
                 batch_size: int = 100,
                 learning_rate: float = 0.001,
                 optimizer: Optional[Optimizer] = None,
                 model_dir: Optional[str] = None, seed: int = 0,
                 **kwargs):
        super().__init__(model=None, model_dir=model_dir, **kwargs)
        self.batch_size = batch_size
        self.gradient_penalty = gradient_penalty
        self._rng = jax.random.PRNGKey(seed)
        opt = optimizer or Adam(learning_rate=learning_rate)
        self._gen_opt = opt._create_optax_optimizer()
        self._disc_opt = opt._create_optax_optimizer()
        self.generator = self.create_generator()
        self.discriminator = self.create_discriminator()
        self._built = False
        self._gen_step = None
        self._disc_step = None

    # -- subclass hooks (reference gan.py contract) ------------------------
    def get_noise_input_shape(self) -> Sequence[int]:
        raise NotImplementedError

    def get_data_input_shapes(self) -> Sequence[Sequence[int]]:
        raise NotImplementedError

    def get_conditional_input_shapes(self) -> Sequence[Sequence[int]]:
        return []

    def get_noise_batch(self, batch_size: int) -> np.ndarray:
        """A batch of generator noise — normal by default; subclasses
        override for other distributions (reference gan.py:389)."""
        return np.random.normal(
            size=(batch_size,) + tuple(self.get_noise_input_shape())
        ).astype(np.float32)

    def gen_loss_fn(self, discrim_output):
        """Torch-harness spelling of create_generator_loss (reference
        torch gan.py gen_loss_fn)."""
        return self.create_generator_loss(discrim_output)

    def discrim_loss_fn(self, discrim_output_train, discrim_output_gen):
        """Torch-harness spelling of create_discriminator_loss
        (reference torch gan.py discrim_loss_fn)."""
        return self.create_discriminator_loss(discrim_output_train,
                                              discrim_output_gen)

    def create_generator(self) -> nn.Module:
        raise NotImplementedError

    def create_discriminator(self) -> nn.Module:
        raise NotImplementedError

    # -- losses (overridden by WGAN) ---------------------------------------
    def create_generator_loss(self, discrim_output: jnp.ndarray
                              ) -> jnp.ndarray:
        return -jnp.mean(jnp.log(discrim_output + 1e-10))

    def create_discriminator_loss(self, discrim_output_train: jnp.ndarray,
                                  discrim_output_gen: jnp.ndarray
                                  ) -> jnp.ndarray:
        return -jnp.mean(jnp.log(discrim_output_train + 1e-10)
                         + jnp.log(1 - discrim_output_gen + 1e-10))

    # -- internals ---------------------------------------------------------
    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _noise(self, rng):
        return jax.random.normal(
            rng, (self.batch_size,) + tuple(self.get_noise_input_shape()))

    def _build(self, data_sample: List[jnp.ndarray],
               cond_sample: List[jnp.ndarray]) -> None:
        rng = self._next_rng()
        noise = self._noise(rng)
        self.gen_params = self.generator.init(
            {'params': self._next_rng()}, noise, *cond_sample)
        gen_out = self.generator.apply(self.gen_params, noise,
                                       *cond_sample)
        gen_out = list(gen_out) if isinstance(gen_out, (list, tuple)) \
            else [gen_out]
        self.disc_params = self.discriminator.init(
            {'params': self._next_rng()}, *data_sample, *cond_sample)
        self.gen_opt_state = self._gen_opt.init(self.gen_params)
        self.disc_opt_state = self._disc_opt.init(self.disc_params)
        self._built = True

    def _make_steps(self):
        gan = self

        def gen_step(gen_params, gen_opt_state, disc_params, rng, cond):
            def loss_fn(gp):
                noise = gan._noise(rng)
                fake = gan.generator.apply(gp, noise, *cond)
                fake = list(fake) if isinstance(fake, (list, tuple)) \
                    else [fake]
                d_out = gan.discriminator.apply(disc_params, *fake, *cond)
                return gan.create_generator_loss(d_out)
            loss, grads = jax.value_and_grad(loss_fn)(gen_params)
            updates, gen_opt_state = gan._gen_opt.update(
                grads, gen_opt_state, gen_params)
            gen_params = optax.apply_updates(gen_params, updates)
            return gen_params, gen_opt_state, loss

        def disc_step(disc_params, disc_opt_state, gen_params, rng, data,
                      cond):
            def loss_fn(dp):
                noise = gan._noise(rng)
                fake = gan.generator.apply(gen_params, noise, *cond)
                fake = list(fake) if isinstance(fake, (list, tuple)) \
                    else [fake]
                d_real = gan.discriminator.apply(dp, *data, *cond)
                d_fake = gan.discriminator.apply(dp, *fake, *cond)
                loss = gan.create_discriminator_loss(d_real, d_fake)
                if gan.gradient_penalty > 0:
                    eps0 = jax.random.uniform(rng, (data[0].shape[0],))
                    interp = [
                        eps0.reshape((-1,) + (1,) * (r.ndim - 1)) * r
                        + (1 - eps0.reshape((-1,) + (1,) * (r.ndim - 1)))
                        * f
                        for r, f in zip(data, fake)]

                    def d_on(x_list):
                        return jnp.sum(gan.discriminator.apply(
                            dp, *x_list, *cond))
                    grads_i = jax.grad(d_on)(interp)
                    gnorm = jnp.sqrt(sum(
                        jnp.sum(jnp.square(g),
                                axis=tuple(range(1, g.ndim)))
                        for g in grads_i) + 1e-12)
                    loss = loss + gan.gradient_penalty * jnp.mean(
                        jnp.square(gnorm - 1.0))
                return loss
            loss, grads = jax.value_and_grad(loss_fn)(disc_params)
            updates, disc_opt_state = gan._disc_opt.update(
                grads, disc_opt_state, disc_params)
            disc_params = optax.apply_updates(disc_params, updates)
            return disc_params, disc_opt_state, loss

        return jax.jit(gen_step), jax.jit(disc_step)

    def fit_gan(self, batches: Iterable[Dict],
                generator_steps: float = 1.0,
                max_checkpoints_to_keep: int = 5,
                checkpoint_interval: int = 2000,
                restore: bool = False) -> None:
        """(reference gan.py fit_gan).  ``batches`` yield dicts mapping
        data/conditional input index -> array."""
        gen_loss_total = disc_loss_total = 0.0
        n_batches = 0
        gen_credit = 0.0
        if self._gen_step is None:
            self._gen_step, self._disc_step = self._make_steps()
        t0 = time.time()
        for batch in batches:
            data = [jnp.asarray(np.asarray(
                batch[f'data_{i}'] if f'data_{i}' in batch else
                batch[i]), dtype=jnp.float32)
                for i in range(len(self.get_data_input_shapes()))]
            n_cond = len(self.get_conditional_input_shapes())
            cond = [jnp.asarray(np.asarray(
                batch.get(f'cond_{i}',
                          batch.get(len(data) + i))), dtype=jnp.float32)
                for i in range(n_cond)]
            if not self._built:
                self._build(data, cond)
            self.disc_params, self.disc_opt_state, d_loss = \
                self._disc_step(self.disc_params, self.disc_opt_state,
                                self.gen_params, self._next_rng(), data,
                                cond)
            disc_loss_total += float(d_loss)
            gen_credit += generator_steps
            while gen_credit >= 1.0:
                gen_credit -= 1.0
                self.gen_params, self.gen_opt_state, g_loss = \
                    self._gen_step(self.gen_params, self.gen_opt_state,
                                   self.disc_params, self._next_rng(),
                                   cond)
                gen_loss_total += float(g_loss)
            n_batches += 1
            if n_batches % 100 == 0:
                logger.info('step %d: gen loss %g, disc loss %g',
                            n_batches, gen_loss_total / 100,
                            disc_loss_total / 100)
                gen_loss_total = disc_loss_total = 0.0
        logger.info('fit_gan took %.1fs', time.time() - t0)

    def predict_gan_generator(self, batch_size: int = 1,
                              noise_input: Optional[np.ndarray] = None,
                              conditional_inputs: Sequence = (),
                              generator_index: int = 0) -> np.ndarray:
        """(reference gan.py predict_gan_generator)"""
        if noise_input is not None:
            noise = jnp.asarray(np.asarray(noise_input, dtype=np.float32))
        else:
            noise = jax.random.normal(
                self._next_rng(),
                (batch_size,) + tuple(self.get_noise_input_shape()))
        cond = [jnp.asarray(np.asarray(c, dtype=np.float32))
                for c in conditional_inputs]
        if not self._built:
            # need data shapes to init discriminator; generator only is fine
            self.gen_params = self.generator.init(
                {'params': self._next_rng()}, noise, *cond)
        out = self.generator.apply(self.gen_params, noise, *cond)
        if isinstance(out, (list, tuple)):
            return [np.asarray(o) for o in out][0]
        return np.asarray(out)


class WGAN(GAN):
    """Wasserstein GAN with gradient penalty (reference gan.py:462)."""

    def __init__(self, gradient_penalty: float = 10.0, **kwargs):
        super().__init__(gradient_penalty=gradient_penalty, **kwargs)

    def create_generator_loss(self, discrim_output):
        # critic scores fakes low; generator maximizes the critic's score
        return -jnp.mean(discrim_output)

    def create_discriminator_loss(self, discrim_output_train,
                                  discrim_output_gen):
        return jnp.mean(discrim_output_gen) - jnp.mean(
            discrim_output_train)


GANModel = GAN
WGANModel = WGAN
