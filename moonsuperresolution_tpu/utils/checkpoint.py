"""Checkpointing: Orbax train-state save/resume + TF-SavedModel import.

The reference saves three separate Keras SavedModels per epoch with no
optimizer-state resume (spade/models/model.py:569-638; training loops always
restart at epoch 0, train_spade_256.py:70).  Here the *entire* train state —
params for all sub-networks, both optimizer states, and the step counter —
is one Orbax checkpoint, enabling true resume (SURVEY.md §5 requirement).

``import_tf_savedmodel`` converts the reference's published TF 2.x
checkpoints into our flax parameter pytrees so fidelity can be validated
against the original weights (BASELINE.md north-star: <0.5% DEM RMSE).
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
    """Save a full train-state pytree (params + opt states + step)."""
    _checkpointer().save(os.path.abspath(path), state, force=True)


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a train state; ``template`` (an abstract or concrete state
    with the right structure) restores into matching dtypes/shardings."""
    ckpt = _checkpointer()
    if template is not None:
        import orbax.checkpoint as ocp

        return ckpt.restore(
            os.path.abspath(path), item=template
        )
    return ckpt.restore(os.path.abspath(path))


def save_params(path: str, params: Any) -> None:
    save_checkpoint(path, params)


def restore_params(path: str) -> Any:
    return restore_checkpoint(path)


# ---------------------------------------------------------------------------
# TF SavedModel -> flax importer
# ---------------------------------------------------------------------------

# Keras layer-name -> our module-path mapping for each sub-network.  The
# reference builds layers in deterministic order, so Keras' auto-numbered
# names map positionally (conv2d, conv2d_1, ... per build order).


def _tf_vars(savedmodel_dir: str):
    """Load a TF SavedModel and return {variable_name: np.ndarray}."""
    import tensorflow as tf  # gated: only needed for importing TF ckpts

    loaded = tf.saved_model.load(savedmodel_dir)
    out = {}
    for v in loaded.variables:
        out[v.name] = v.numpy()
    return out, loaded


def import_tf_encoder(savedmodel_dir: str, latent_dim: int = 256):
    """Convert the reference encoder SavedModel (networks.py:8-34) into our
    Encoder params: 5 downsample blocks (conv [+ instance norm]) then the
    mean/variance Dense heads."""
    variables, loaded = _tf_vars(savedmodel_dir)
    # Order variables by the Keras build order captured in the SavedModel.
    seq = [v.numpy() for v in loaded.variables]
    names = [v.name for v in loaded.variables]
    return _encoder_params_from_ordered(names, seq, latent_dim)


def _encoder_params_from_ordered(names, values, latent_dim):
    by_name = dict(zip(names, values))
    convs = [v for n, v in zip(names, values) if "conv2d" in n and "kernel" in n]
    gammas = [v for n, v in zip(names, values)
              if "instance_normalization" in n and "gamma" in n]
    betas = [v for n, v in zip(names, values)
             if "instance_normalization" in n and "beta" in n]
    dense_k = [v for n, v in zip(names, values) if "dense" in n or "mean" in n
               or "variance" in n]
    params = {}
    norm_idx = 0
    for i in range(5):
        block = {"conv": {"kernel": convs[i]}}
        if i > 0:  # first block has no norm (networks.py:19-21)
            block["norm"] = {"scale": gammas[norm_idx].reshape(-1),
                             "bias": betas[norm_idx].reshape(-1)}
            norm_idx += 1
        params[f"down_{i}"] = block
    # mean / variance Dense heads (kernel + bias each)
    mk = by_name.get("mean/kernel:0")
    mb = by_name.get("mean/bias:0")
    vk = by_name.get("variance/kernel:0")
    vb = by_name.get("variance/bias:0")
    params["mean"] = {"kernel": mk, "bias": mb}
    params["variance"] = {"kernel": vk, "bias": vb}
    return jax.tree_util.tree_map(np.asarray, params)


def import_tf_generator(savedmodel_dir: str, image_size: int):
    """Convert the reference SPADE generator SavedModel (networks.py:37-57).

    Layer order inside each ResidualBlock (blocks.py:9-38): spade_1, spade_2,
    [spade_3], conv_1, conv_2, [conv_3]; each SPADE holds conv (shared 128ch),
    conv_gamma, conv_beta.  Keras flattens these in build order; we rebuild
    positionally from the variable list.
    """
    import tensorflow as tf

    loaded = tf.saved_model.load(savedmodel_dir)
    names = [v.name for v in loaded.variables]
    values = [v.numpy() for v in loaded.variables]
    return _generator_params_from_ordered(names, values, image_size)


def _spade_from(prefix_vars):
    """prefix_vars: list of 6 (kernel, bias) pairs in conv, gamma, beta order."""
    (ck, cb), (gk, gb), (bk, bb) = prefix_vars
    return {
        "conv": {"kernel": ck, "bias": cb},
        "conv_gamma": {"kernel": gk, "bias": gb},
        "conv_beta": {"kernel": bk, "bias": bb},
    }


def _generator_params_from_ordered(names, values, image_size):
    # Group variables per layer path prefix from the TF name, preserving order.
    groups: dict[str, dict[str, np.ndarray]] = {}
    order: list[str] = []
    for n, v in zip(names, values):
        path, leaf = n.rsplit("/", 1)
        leaf = leaf.split(":")[0]
        if path not in groups:
            groups[path] = {}
            order.append(path)
        groups[path][leaf] = v

    dense_paths = [p for p in order if "dense" in p.split("/")[-1]]
    conv_paths = [p for p in order if p.split("/")[-1].startswith("conv2d")]
    params: dict = {}
    params["dense"] = {"kernel": groups[dense_paths[0]]["kernel"],
                       "bias": groups[dense_paths[0]]["bias"]}
    # Channel plan decides which blocks have the learned skip (in != out).
    plan_in = [1024, 1024, 1024, 1024, 512, 256]
    plan_out = [1024, 1024, 1024, 512, 256, 128]
    ci = 0
    for b in range(6):
        has_skip = plan_in[b] != plan_out[b]
        n_spade = 3 if has_skip else 2
        n_conv = 3 if has_skip else 2
        spades = []
        for s in range(n_spade):
            triple = []
            for _ in range(3):
                g = groups[conv_paths[ci]]
                triple.append((g["kernel"], g["bias"]))
                ci += 1
            spades.append(_spade_from(triple))
        convs = []
        for c in range(n_conv):
            g = groups[conv_paths[ci]]
            convs.append({"kernel": g["kernel"], "bias": g["bias"]})
            ci += 1
        block = {
            "spade_1": spades[0],
            "spade_2": spades[1],
            "conv_1": convs[0],
            "conv_2": convs[1],
        }
        if has_skip:
            block["spade_3"] = spades[2]
            block["conv_3"] = convs[2]
        params[f"resblock_{b}"] = block
    # final head conv
    g = groups[conv_paths[ci]]
    params["head"] = {"kernel": g["kernel"], "bias": g["bias"]}
    return jax.tree_util.tree_map(np.asarray, params)


def import_tf_discriminator(savedmodel_dir: str):
    """Convert the reference multi-scale discriminator (networks.py:60-76)."""
    import tensorflow as tf

    loaded = tf.saved_model.load(savedmodel_dir)
    names = [v.name for v in loaded.variables]
    values = [v.numpy() for v in loaded.variables]
    convs = [(n, v) for n, v in zip(names, values)
             if "conv2d" in n and "kernel" in n]
    conv_biases = [(n, v) for n, v in zip(names, values)
                   if "conv2d" in n and "bias" in n]
    gammas = [v for n, v in zip(names, values)
              if "instance_normalization" in n and "gamma" in n]
    betas = [v for n, v in zip(names, values)
             if "instance_normalization" in n and "beta" in n]
    params = {}
    for i in range(4):
        block = {"conv": {"kernel": convs[i][1]}}
        if i > 0:
            block["norm"] = {"scale": gammas[i - 1].reshape(-1),
                             "bias": betas[i - 1].reshape(-1)}
        params[f"down_{i}"] = block
    params["head"] = {"kernel": convs[4][1], "bias": conv_biases[0][1]}
    return jax.tree_util.tree_map(np.asarray, params)


def import_tf_savedmodel(
    checkpoint_dir: str, image_size: int, latent_dim: int = 256,
    with_discriminator: bool = True,
):
    """Import a full reference checkpoint directory
    (generator/ discriminator/ encoder/ SavedModels, model.py:569-605)."""
    params = {
        "generator": import_tf_generator(
            os.path.join(checkpoint_dir, "generator"), image_size
        ),
        "encoder": import_tf_encoder(
            os.path.join(checkpoint_dir, "encoder"), latent_dim
        ),
    }
    disc_dir = os.path.join(checkpoint_dir, "discriminator")
    if with_discriminator and os.path.isdir(disc_dir):
        params["discriminator"] = import_tf_discriminator(disc_dir)
    return params
