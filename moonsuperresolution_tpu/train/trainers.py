"""Jitted training/validation steps for all four model families.

Reimplements the reference's eager Keras train loops (spade/models/model.py
GauGAN:440-567, GauGAN_no_KL:141-267, CNNSpade:714-791; pix2pix.py:143-176)
as pure JAX functions over explicit state pytrees.  Everything is jitted —
the reference compiles only pix2pix (SURVEY.md §0.7); here every step is one
XLA program per variant.

Step semantics preserved for training parity:
- The GAN step updates the discriminator first (with the generator output
  computed *outside* the tape and a fresh latent draw), then the generator
  (fresh latent draw again, discriminator frozen at its just-updated values)
  — exactly the reference's two-phase eager flow (model.py:451-504).
- GauGAN samples z = mean + exp(0.5*logvar)*eps; GauGAN_no_KL and CNNSpade
  use the deterministic latent mean + logvar (model.py:153-154, 727-728).
- Optimizers are Adam with Keras defaults (eps 1e-7): gen 1e-4 / disc 5e-5,
  beta1=0 (model.py:440-445); pix2pix 2e-4, beta1=0.5 (pix2pix.py:31-32).

Parallelism: steps contain no axis names — they are pjit/GSPMD programs.
Shard the state/batch with ``parallel.mesh`` helpers and XLA inserts the
collectives (gradient all-reduce falls out of batch-sharded loss reduction).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from moonsuperresolution_tpu import losses as L
from moonsuperresolution_tpu.config import TrainConfig
from moonsuperresolution_tpu.models.networks import (
    Encoder,
    SpadeDiscriminator,
    SpadeGenerator,
    sample_latent,
)
from moonsuperresolution_tpu.models.pix2pix import (
    Pix2PixDiscriminator,
    Pix2PixGenerator,
)
from moonsuperresolution_tpu.models import vgg as vggmod


class TrainState(flax.struct.PyTreeNode):
    """State for the SPADE family: generator+encoder share one optimizer,
    the (optional) discriminator has its own (model.py:440-449)."""

    params: Any                    # {'generator', 'encoder'[, 'discriminator']}
    gen_opt_state: Any
    disc_opt_state: Any
    step: jnp.ndarray


class Pix2PixState(flax.struct.PyTreeNode):
    params: Any                    # {'generator', 'discriminator'}
    gen_opt_state: Any
    disc_opt_state: Any
    step: jnp.ndarray


def _adam(lr: float, b1: float, b2: float, eps: float):
    return optax.adam(lr, b1=b1, b2=b2, eps=eps)


class GauGANTrainer:
    """Trainer for the gaugan / gaugan_no_kl / cnn_spade variants."""

    def __init__(self, cfg: TrainConfig, vgg_params=None):
        self.cfg = cfg
        m = cfg.model
        self.variant = m.variant
        assert self.variant in ("gaugan", "gaugan_no_kl", "cnn_spade")
        self.has_disc = self.variant != "cnn_spade"

        dtype = jnp.bfloat16 if m.compute_dtype == "bfloat16" else jnp.float32
        sdtype = jnp.bfloat16 if m.stats_dtype == "bfloat16" else jnp.float32
        self.encoder = Encoder(latent_dim=m.latent_dim, alpha=m.alpha,
                               downsample_factor=m.encoder_filters,
                               dtype=dtype)
        self.generator = SpadeGenerator(
            image_size=m.image_size, alpha=m.alpha, stats=m.spade_stats,
            channel_plan=tuple(m.channel_plan),
            dtype=dtype, stats_dtype=sdtype,
            fuse_spade_gb=m.fuse_spade_gb,
            subpixel_head=m.subpixel_head,
        )
        self.discriminator = SpadeDiscriminator(
            downsample_factor=m.disc_filters, alpha=m.alpha, dtype=dtype)

        o = cfg.optimizer
        self.gen_tx = _adam(o.gen_lr, o.beta1, o.beta2, o.eps)
        self.disc_tx = _adam(o.disc_lr, o.beta1, o.beta2, o.eps)
        if cfg.grad_accum > 1:
            # Mean-accumulate gradients over grad_accum micro-steps; the
            # inner Adam applies once per effective batch (reference bs2
            # 512 recipes gain effective batch without more HBM).
            self.gen_tx = optax.MultiSteps(self.gen_tx, cfg.grad_accum)
            self.disc_tx = optax.MultiSteps(self.disc_tx, cfg.grad_accum)

        # Lazy: inference-only callers (engine, bench) never touch the
        # perceptual loss, so the VGG params are built on first access —
        # and the random-weights fallback warns LOUDLY there (VERDICT r3:
        # with random features the perceptual term is a different, weaker
        # objective than the reference's imagenet-VGG19,
        # spade/losses.py:56-80).
        self._vgg_params = vgg_params

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._val_step = jax.jit(self._val_step_impl)
        self._forward = jax.jit(self._forward_impl)

    @property
    def vgg_params(self):
        if self._vgg_params is None:
            cfg = self.cfg
            if cfg.vgg_weights_path:
                self._vgg_params = vggmod.load_vgg19_params(
                    cfg.vgg_weights_path)
            else:
                import warnings

                warnings.warn(
                    "No VGG19 weights given (TrainConfig.vgg_weights_path / "
                    "--vgg_weights): the perceptual loss will use FIXED-SEED "
                    "RANDOM conv features — a different objective than the "
                    "reference's imagenet-VGG19 (spade/losses.py:56-80). "
                    "Convert real weights with `python -m "
                    "moonsuperresolution_tpu.cli.convert_vgg` once a Keras "
                    ".h5 / torchvision .pth artifact is obtainable "
                    "(scripts/fetch_vgg19_weights.md).",
                    stacklevel=2,
                )
                self._vgg_params = vggmod.init_vgg_params(seed=cfg.seed)
        return self._vgg_params

    @vgg_params.setter
    def vgg_params(self, value):
        self._vgg_params = value

    # ---------------------------------------------------------------- init

    def init(self, rng: jax.Array) -> TrainState:
        m = self.cfg.model
        b = self.cfg.batch_size
        src = jnp.zeros((b, m.image_size, m.image_size, 2), jnp.float32)
        tgt = jnp.zeros((b, m.image_size, m.image_size, 1), jnp.float32)
        z = jnp.zeros((b, m.latent_dim), jnp.float32)
        r_enc, r_gen, r_disc = jax.random.split(rng, 3)
        params = {
            "encoder": self.encoder.init(r_enc, src)["params"],
            "generator": self.generator.init(r_gen, z, src)["params"],
        }
        if self.has_disc:
            params["discriminator"] = self.discriminator.init(r_disc, src, tgt)[
                "params"
            ]
        gen_opt = self.gen_tx.init(
            {"generator": params["generator"], "encoder": params["encoder"]}
        )
        disc_opt = (
            self.disc_tx.init(params["discriminator"]) if self.has_disc else ()
        )
        return TrainState(
            params=params,
            gen_opt_state=gen_opt,
            disc_opt_state=disc_opt,
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------- helpers

    def _latent(self, rng, mean, logvar):
        if self.variant == "gaugan":
            return sample_latent(rng, mean, logvar)
        # Deterministic latent of the no-KL variants (model.py:153-154, 727-728).
        return mean + logvar

    def _generate(self, params, source, rng):
        mean, logvar = self.encoder.apply({"params": params["encoder"]}, source)
        z = self._latent(rng, mean, logvar)
        fake = self.generator.apply({"params": params["generator"]}, z, source)
        return fake, mean, logvar

    def _gen_losses(self, fake, mean, logvar, source, target, disc_params,
                    vgg_params):
        """The generator-side loss stack for the current variant."""
        m = self.cfg.model
        out = {}
        if self.has_disc:
            real_feats = self.discriminator.apply(
                {"params": disc_params}, source, target
            )
            fake_feats = self.discriminator.apply(
                {"params": disc_params}, source, fake
            )
            out["g_hinge"] = L.generator_hinge_loss(fake_feats[-1])
            out["feat_loss"] = m.feature_loss_coeff * L.feature_matching_loss(
                real_feats, fake_feats
            )
        out["vgg_loss"] = m.vgg_feature_loss_coeff * vggmod.vgg_feature_matching_loss(
            vgg_params, vggmod.repeat3(target), vggmod.repeat3(fake)
        )
        out["cons_loss"] = m.consistency_loss_coeff * L.consistency_loss(
            fake, target, m.upscaling_factor
        )
        if self.variant == "gaugan":
            out["kl_loss"] = m.kl_divergence_loss_coeff * L.kl_divergence_loss(
                mean, logvar
            )
        else:
            out["norm_loss"] = m.normal_loss_coeff * L.normal_loss(target, fake)
            out["grad_loss"] = m.gradient_loss_coeff * L.gradient_loss(target, fake)
        if self.variant == "cnn_spade":
            out["mse_loss"] = m.mse_loss_coeff * L.mse_loss(fake, target)
        return out

    # ----------------------------------------------------------- train step

    def _train_step_impl(self, state: TrainState, source, target, rng,
                         vgg_params):
        rng_d, rng_g = jax.random.split(rng)
        params = state.params
        metrics = {}

        disc_params = params.get("discriminator")
        disc_opt_state = state.disc_opt_state

        if self.has_disc:
            # --- discriminator phase (model.py:451-469): generator output is
            # a constant (computed outside the tape, fresh latent draw).
            fake, _, _ = self._generate(params, source, rng_d)
            fake = jax.lax.stop_gradient(fake)

            def d_loss_fn(dp):
                pred_fake = self.discriminator.apply(
                    {"params": dp}, source, fake
                )[-1]
                pred_real = self.discriminator.apply(
                    {"params": dp}, source, target
                )[-1]
                return 0.5 * (
                    L.discriminator_hinge_loss(pred_fake, False)
                    + L.discriminator_hinge_loss(pred_real, True)
                )

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(disc_params)
            d_updates, disc_opt_state = self.disc_tx.update(
                d_grads, disc_opt_state, disc_params
            )
            disc_params = optax.apply_updates(disc_params, d_updates)
            metrics["disc_loss"] = d_loss

        # --- generator phase (model.py:471-504): fresh latent draw,
        # discriminator frozen at its just-updated values.
        def g_loss_fn(ge_params):
            merged = dict(params, **ge_params)
            fake, mean, logvar = self._generate(merged, source, rng_g)
            parts = self._gen_losses(
                fake, mean, logvar, source, target, disc_params, vgg_params
            )
            total = sum(parts.values())
            return total, (parts, fake)

        ge_params = {"generator": params["generator"],
                     "encoder": params["encoder"]}
        (g_total, (parts, fake)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(ge_params)
        g_updates, gen_opt_state = self.gen_tx.update(
            g_grads, state.gen_opt_state, ge_params
        )
        ge_params = optax.apply_updates(ge_params, g_updates)

        new_params = dict(ge_params)
        if self.has_disc:
            new_params["discriminator"] = disc_params
        key = "total_loss" if self.variant == "cnn_spade" else "gen_loss"
        metrics[key] = g_total
        metrics.update(parts)
        new_state = state.replace(
            params=new_params,
            gen_opt_state=gen_opt_state,
            disc_opt_state=disc_opt_state,
            step=state.step + 1,
        )
        return new_state, metrics, fake

    def _val_step_impl(self, params, source, target, rng, vgg_params):
        """Loss evaluation without updates (model.py:524-562, 763-787)."""
        fake, mean, logvar = self._generate(params, source, rng)
        metrics = {}
        disc_params = params.get("discriminator")
        if self.has_disc:
            pred_fake = self.discriminator.apply(
                {"params": disc_params}, source, fake
            )[-1]
            pred_real = self.discriminator.apply(
                {"params": disc_params}, source, target
            )[-1]
            metrics["disc_loss"] = 0.5 * (
                L.discriminator_hinge_loss(pred_fake, False)
                + L.discriminator_hinge_loss(pred_real, True)
            )
        parts = self._gen_losses(
            fake, mean, logvar, source, target, disc_params, vgg_params
        )
        key = "total_loss" if self.variant == "cnn_spade" else "gen_loss"
        metrics[key] = sum(parts.values())
        metrics.update(parts)
        return metrics, fake

    def _forward_impl(self, params, source, rng):
        """Full inference forward (model.py:564-567 / 789-791)."""
        fake, _, _ = self._generate(params, source, rng)
        return fake

    # ------------------------------------------------------------ public API

    def train_step(self, state, source, target, rng):
        return self._train_step(state, source, target, rng, self.vgg_params)

    def val_step(self, params, source, target, rng):
        return self._val_step(params, source, target, rng, self.vgg_params)

    def forward(self, params, source, rng):
        return self._forward(params, source, rng)


class Pix2PixTrainer:
    """pix2pix trainer (pix2pix.py:143-176): generator and discriminator
    gradients are taken from the *same* forward pass and applied
    simultaneously."""

    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        self.generator = Pix2PixGenerator(depth=cfg.model.pix2pix_depth)
        self.discriminator = Pix2PixDiscriminator()
        o = cfg.optimizer
        self.gen_tx = _adam(o.gen_lr, o.beta1, o.beta2, o.eps)
        self.disc_tx = _adam(o.disc_lr, o.beta1, o.beta2, o.eps)
        if cfg.grad_accum > 1:
            # Mean-accumulate gradients over grad_accum micro-steps; the
            # inner Adam applies once per effective batch (reference bs2
            # 512 recipes gain effective batch without more HBM).
            self.gen_tx = optax.MultiSteps(self.gen_tx, cfg.grad_accum)
            self.disc_tx = optax.MultiSteps(self.disc_tx, cfg.grad_accum)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._val_step = jax.jit(self._val_step_impl)
        self._forward = jax.jit(self._forward_impl)

    def init(self, rng: jax.Array) -> Pix2PixState:
        m = self.cfg.model
        b = self.cfg.batch_size
        src = jnp.zeros((b, m.image_size, m.image_size, 2), jnp.float32)
        tgt = jnp.zeros((b, m.image_size, m.image_size, 1), jnp.float32)
        r_gen, r_disc = jax.random.split(rng)
        params = {
            "generator": self.generator.init(
                {"params": r_gen, "dropout": r_gen}, src
            )["params"],
            "discriminator": self.discriminator.init(r_disc, src, tgt)["params"],
        }
        return Pix2PixState(
            params=params,
            gen_opt_state=self.gen_tx.init(params["generator"]),
            disc_opt_state=self.disc_tx.init(params["discriminator"]),
            step=jnp.zeros((), jnp.int32),
        )

    def _losses(self, params, source, target, rng, deterministic):
        gen_out = self.generator.apply(
            {"params": params["generator"]},
            source,
            deterministic,
            rngs=None if deterministic else {"dropout": rng},
        )
        d_real = self.discriminator.apply(
            {"params": params["discriminator"]}, source, target
        )
        d_fake = self.discriminator.apply(
            {"params": params["discriminator"]}, source, gen_out
        )
        g_total, gan, l1 = L.pix2pix_generator_loss(
            d_fake, gen_out, target, self.cfg.model.l1_lambda
        )
        d_loss = L.pix2pix_discriminator_loss(d_real, d_fake)
        return g_total, gan, l1, d_loss, gen_out

    def _train_step_impl(self, state: Pix2PixState, source, target, rng):
        def g_loss_fn(gp):
            p = {"generator": gp, "discriminator": state.params["discriminator"]}
            g_total, gan, l1, d_loss, gen_out = self._losses(
                p, source, target, rng, deterministic=False
            )
            return g_total, (gan, l1, d_loss, gen_out)

        def d_loss_fn(dp):
            p = {"generator": state.params["generator"], "discriminator": dp}
            g_total, gan, l1, d_loss, _ = self._losses(
                p, source, target, rng, deterministic=False
            )
            return d_loss

        (g_total, (gan, l1, d_loss, gen_out)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params["generator"])
        d_grads = jax.grad(d_loss_fn)(state.params["discriminator"])

        g_up, gen_opt = self.gen_tx.update(
            g_grads, state.gen_opt_state, state.params["generator"]
        )
        d_up, disc_opt = self.disc_tx.update(
            d_grads, state.disc_opt_state, state.params["discriminator"]
        )
        new_params = {
            "generator": optax.apply_updates(state.params["generator"], g_up),
            "discriminator": optax.apply_updates(
                state.params["discriminator"], d_up
            ),
        }
        metrics = {"gen_loss": g_total, "gan_loss": gan, "l1_loss": l1,
                   "disc_loss": d_loss}
        new_state = state.replace(
            params=new_params, gen_opt_state=gen_opt, disc_opt_state=disc_opt,
            step=state.step + 1,
        )
        return new_state, metrics, gen_out

    def _val_step_impl(self, params, source, target, rng):
        # Reference parity: val runs with training=True — live dropout and
        # BN batch stats (pix2pix.py:163-169) — so val-loss curves match the
        # reference's during training-parity comparisons.  Deterministic
        # given the same rng (the loop folds a fixed per-epoch key).
        g_total, gan, l1, d_loss, gen_out = self._losses(
            params, source, target, rng, deterministic=False
        )
        return (
            {"gen_loss": g_total, "gan_loss": gan, "l1_loss": l1,
             "disc_loss": d_loss},
            gen_out,
        )

    def _forward_impl(self, params, source):
        return self.generator.apply(
            {"params": params["generator"]}, source, True
        )

    def train_step(self, state, source, target, rng):
        return self._train_step(state, source, target, rng)

    def val_step(self, params, source, target, rng):
        return self._val_step(params, source, target, rng)

    def forward(self, params, source, rng=None):
        return self._forward(params, source)


def make_trainer(cfg: TrainConfig, vgg_params=None):
    if cfg.model.variant == "pix2pix":
        return Pix2PixTrainer(cfg)
    return GauGANTrainer(cfg, vgg_params=vgg_params)
