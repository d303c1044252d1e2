"""Checkpointing: Orbax train-state save/resume + TF/Keras weight import.

The reference saves three separate Keras SavedModels per epoch with no
optimizer-state resume (spade/models/model.py:569-638; training loops always
restart at epoch 0, train_spade_256.py:70).  Here the *entire* train state —
params for all sub-networks, both optimizer states, and the step counter —
is one Orbax checkpoint, enabling true resume (SURVEY.md §5 requirement).

The import path converts reference-architecture Keras weights into our flax
parameter pytrees so fidelity can be validated against original checkpoints
(BASELINE.md north-star: <0.5% DEM RMSE).  Conversion is *order- and
shape-driven*: Keras materializes variables in layer-creation order
(deterministic for the reference's builders, networks.py:8-76), so the
mapping keys on that order plus tensor ranks rather than on era-specific
variable naming.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any) -> None:
    """Save a full train-state pytree (params + opt states + step).

    Multi-process runs: this is a *collective* — Orbax's Checkpointer.save
    runs sync_global_processes barriers internally, so every process must
    call it (host numpy values are written by the primary process only;
    sharded jax.Arrays write their addressable shards from each process).
    Pinned by tests/test_distributed.py's save->restore->resume round trip.
    """
    _checkpointer().save(os.path.abspath(path), state, force=True)


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a train state; ``template`` (a concrete state with the right
    structure) restores into matching dtypes/shardings."""
    ckpt = _checkpointer()
    if template is not None:
        return ckpt.restore(os.path.abspath(path), item=template)
    return ckpt.restore(os.path.abspath(path))


def save_params(path: str, params: Any) -> None:
    save_checkpoint(path, params)


def restore_params(path: str) -> Any:
    return restore_checkpoint(path)


# ---------------------------------------------------------------------------
# Keras/TF weight import (order- and shape-driven)
# ---------------------------------------------------------------------------


class _WeightStream:
    """Sequential reader over (name, value) pairs in creation order.

    Two guards make mis-mapped imports fail loudly instead of silently:

    - ``take``'s shape predicate (a Dense where a conv was expected, etc.);
    - a *creation-order* check on Keras auto-generated layer names: TF
      numbers same-type layers in creation order (``conv2d``, ``conv2d_1``,
      ...), so within one SavedModel the per-family index must never
      decrease.  Any permutation of same-shape tensors (e.g. a resblock's
      conv_1 and conv_2, both [3,3,1024,1024] — undetectable by shape)
      trips this check.  Streams with uninformative names (no layer path)
      skip the guard; order+shape remain the contract there.
    """

    def __init__(self, names, values):
        self.items = list(zip(names, values))
        self.pos = 0
        self._family_idx: dict = {}

    @staticmethod
    def _layer_family(name):
        """('conv2d', 3) from 'model/conv2d_3/kernel:0'; None if the name
        carries no layer path."""
        if not isinstance(name, str) or "/" not in name:
            return None
        layer = name.split("/")[-2]
        if not layer:
            return None
        import re

        m = re.fullmatch(r"(.*?)(?:_(\d+))?", layer)
        base, idx = m.group(1), m.group(2)
        if not base:
            return None
        return base, int(idx) if idx is not None else 0

    def _check_order(self, name):
        fam = self._layer_family(name)
        if fam is None:
            return
        base, idx = fam
        prev = self._family_idx.get(base)
        if prev is not None and idx < prev:
            raise ValueError(
                f"weight stream out of creation order at #{self.pos}: "
                f"layer '{base}_{idx}' after '{base}_{prev}' — the "
                f"SavedModel's variable order does not match the reference "
                f"builders' creation order; refusing to import (same-shape "
                f"tensors would be silently mis-mapped)"
            )
        self._family_idx[base] = max(idx, prev if prev is not None else idx)

    def take(self, pred, what: str):
        """Pop the next item matching ``pred`` (skipping non-matches is NOT
        allowed — order is the contract)."""
        if self.pos >= len(self.items):
            raise ValueError(f"weight stream exhausted looking for {what}")
        name, val = self.items[self.pos]
        if not pred(name, val):
            raise ValueError(
                f"unexpected weight at #{self.pos} ({name}, shape "
                f"{np.shape(val)}) while looking for {what}"
            )
        self._check_order(name)
        self.pos += 1
        return np.asarray(val)

    def skip(self, n: int):
        """Skip n items (e.g. BatchNorm moving statistics, which the
        batch-stat norm never uses)."""
        self.pos += n

    def done(self) -> bool:
        return self.pos >= len(self.items)


def _is_kernel4(name, v):
    return np.ndim(v) == 4


def _is_kernel2(name, v):
    return np.ndim(v) == 2


def _is_vec(name, v):
    return np.ndim(v) == 1


def _conv(stream, bias=True, what="conv"):
    k = stream.take(_is_kernel4, f"{what}.kernel")
    if bias:
        b = stream.take(_is_vec, f"{what}.bias")
        return {"kernel": k, "bias": b}
    return {"kernel": k}


def _norm(stream, what="norm"):
    g = stream.take(_is_vec, f"{what}.gamma")
    b = stream.take(_is_vec, f"{what}.beta")
    return {"scale": g.reshape(-1), "bias": b.reshape(-1)}


def _dense(stream, what="dense"):
    k = stream.take(_is_kernel2, f"{what}.kernel")
    b = stream.take(_is_vec, f"{what}.bias")
    return {"kernel": k, "bias": b}


def _spade(stream, what="spade"):
    """One SPADE layer = conv(128) + conv_gamma + conv_beta, created in that
    order (spade/models/spade.py:8-11)."""
    return {
        "conv": _conv(stream, what=f"{what}.conv"),
        "conv_gamma": _conv(stream, what=f"{what}.conv_gamma"),
        "conv_beta": _conv(stream, what=f"{what}.conv_beta"),
    }


def encoder_params_from_weights(names, values):
    """Reference encoder (networks.py:8-34): 5 downsample blocks (conv
    without bias; instance norm on blocks 1-4) then mean/variance Dense
    heads.  Creation order: block convs+norms, then the two heads."""
    s = _WeightStream(names, values)
    params = {}
    for i in range(5):
        block = {"conv": _conv(s, bias=False, what=f"down_{i}.conv")}
        if i > 0:
            block["norm"] = _norm(s, what=f"down_{i}.norm")
        params[f"down_{i}"] = block
    params["mean"] = _dense(s, "mean")
    params["variance"] = _dense(s, "variance")
    return jax.tree_util.tree_map(np.asarray, params)


def generator_params_from_weights(names, values):
    """Reference SPADE generator (networks.py:37-57).  Creation order:
    Dense, then per resblock (blocks.py:14-27): spade_1, spade_2, conv_1,
    conv_2, [spade_3, conv_3 when channels change], then the 4x4 head."""
    s = _WeightStream(names, values)
    params = {"dense": _dense(s, "latent dense")}
    plan_in = [1024, 1024, 1024, 1024, 512, 256]
    plan_out = [1024, 1024, 1024, 512, 256, 128]
    for b in range(6):
        has_skip = plan_in[b] != plan_out[b]
        block = {
            "spade_1": _spade(s, f"rb{b}.spade_1"),
            "spade_2": _spade(s, f"rb{b}.spade_2"),
            "conv_1": _conv(s, what=f"rb{b}.conv_1"),
            "conv_2": _conv(s, what=f"rb{b}.conv_2"),
        }
        if has_skip:
            block["spade_3"] = _spade(s, f"rb{b}.spade_3")
            block["conv_3"] = _conv(s, what=f"rb{b}.conv_3")
        params[f"resblock_{b}"] = block
    params["head"] = _conv(s, what="head")
    return jax.tree_util.tree_map(np.asarray, params)


def discriminator_params_from_weights(names, values):
    """Reference multi-scale discriminator (networks.py:60-76): 4 downsample
    blocks (conv no-bias; norm on blocks 1-3) + biased 4x4 head conv."""
    s = _WeightStream(names, values)
    params = {}
    for i in range(4):
        block = {"conv": _conv(s, bias=False, what=f"down_{i}.conv")}
        if i > 0:
            block["norm"] = _norm(s, what=f"down_{i}.norm")
        params[f"down_{i}"] = block
    params["head"] = _conv(s, what="head")
    return jax.tree_util.tree_map(np.asarray, params)


def _bn(stream, what="bn"):
    """Keras BatchNormalization: gamma, beta, moving_mean, moving_variance —
    the moving stats are dropped (the reference only ever runs BN in
    training mode, pix2pix.py:146-148, so our norm is batch-stat-only)."""
    g = stream.take(_is_vec, f"{what}.gamma")
    b = stream.take(_is_vec, f"{what}.beta")
    stream.skip(2)
    return {"scale": g.reshape(-1), "bias": b.reshape(-1)}


def pix2pix_generator_params_from_weights(names, values, depth: int = 8):
    """Reference pix2pix U-Net (pix2pix.py:88-108).  Creation order: the
    down stack (conv [+ BN]), the up stack (deconv + BN), then the tanh
    head deconv (kernel layout (kh, kw, out, in), matching our
    transpose_kernel=True modules)."""
    s = _WeightStream(names, values)
    params = {}
    for i in range(depth):
        block = {"conv": _conv(s, bias=False, what=f"down_{i}.conv")}
        if i > 0:
            block["bn"] = _bn(s, f"down_{i}.bn")
        params[f"down_{i}"] = block
    for i in range(depth - 1):
        params[f"up_{i}"] = {
            "deconv": _conv(s, bias=False, what=f"up_{i}.deconv"),
            "bn": _bn(s, f"up_{i}.bn"),
        }
    params["head"] = _conv(s, what="head")
    return jax.tree_util.tree_map(np.asarray, params)


def pix2pix_discriminator_params_from_weights(names, values):
    """Reference pix2pix PatchGAN (pix2pix.py:118-135): 3 downsample blocks,
    conv(512)+BN, conv(1)."""
    s = _WeightStream(names, values)
    params = {}
    for i in range(3):
        block = {"conv": _conv(s, bias=False, what=f"down_{i}.conv")}
        if i > 0:
            block["bn"] = _bn(s, f"down_{i}.bn")
        params[f"down_{i}"] = block
    params["conv"] = _conv(s, bias=False, what="conv512")
    params["bn"] = _bn(s, "bn")
    params["head"] = _conv(s, what="head")
    return jax.tree_util.tree_map(np.asarray, params)


def _keras_ordered_weights(keras_model):
    """(names, values) for a live Keras model, in creation order."""
    names = [getattr(w, "path", None) or w.name for w in keras_model.weights]
    values = [np.asarray(w) for w in keras_model.weights]
    return names, values


def _savedmodel_ordered_weights(savedmodel_dir: str):
    """(names, values) from a TF SavedModel directory (checkpoint order =
    creation order for the reference's builders)."""
    import tensorflow as tf

    loaded = tf.saved_model.load(savedmodel_dir)
    names = [v.name for v in loaded.variables]
    values = [v.numpy() for v in loaded.variables]
    return names, values


def import_tf_savedmodel(
    checkpoint_dir: str,
    with_discriminator: bool = True,
):
    """Import a full reference checkpoint directory (generator/
    discriminator/ encoder/ SavedModels, model.py:569-605) into our
    parameter pytree layout."""
    n, v = _savedmodel_ordered_weights(os.path.join(checkpoint_dir, "generator"))
    params = {"generator": generator_params_from_weights(n, v)}
    n, v = _savedmodel_ordered_weights(os.path.join(checkpoint_dir, "encoder"))
    params["encoder"] = encoder_params_from_weights(n, v)
    disc_dir = os.path.join(checkpoint_dir, "discriminator")
    if with_discriminator and os.path.isdir(disc_dir):
        n, v = _savedmodel_ordered_weights(disc_dir)
        params["discriminator"] = discriminator_params_from_weights(n, v)
    return params
