"""Adversarial TF-import tests (VERDICT r2 item 6).

Genuine TF 2.4 artifacts are unobtainable in this zero-egress environment,
so the importer's central risk — TF 2.4's variable ordering differing from
the assumed creation order — is attacked directly: build weight streams with
era-plausible Keras auto-generated names (``conv2d_N``/``dense_N``, numbered
in creation order, exactly what TF 2.x emits for the reference's unnamed
layers, spade/models/networks.py:8-76), then permute same-shape tensors and
assert the importer FAILS LOUDLY rather than silently mis-mapping
(utils/checkpoint.py::_WeightStream order guard).
"""

import numpy as np
import pytest

from moonsuperresolution_tpu.utils.checkpoint import (
    encoder_params_from_weights,
    generator_params_from_weights,
)


def _encoder_stream(latent=32, image=64):
    """Era-plausible (name, value) stream for the reference encoder: 5
    no-bias convs (norm on 1-4), then mean/variance Dense heads."""
    rng = np.random.default_rng(0)
    names, values = [], []
    conv_i = 0
    norm_i = 0
    chans = [(2, 64), (64, 128), (128, 256), (256, 512), (512, 512)]
    for i, (ci, co) in enumerate(chans):
        suffix = f"_{conv_i}" if conv_i else ""
        names.append(f"conv2d{suffix}/kernel:0")
        values.append(rng.standard_normal((3, 3, ci, co)).astype(np.float32))
        conv_i += 1
        if i > 0:
            suffix = f"_{norm_i}" if norm_i else ""
            names.append(f"instance_normalization{suffix}/gamma:0")
            values.append(np.ones((co,), np.float32))
            names.append(f"instance_normalization{suffix}/beta:0")
            values.append(np.zeros((co,), np.float32))
            norm_i += 1
    flat = (image // 32) ** 2 * 512
    for j, head in enumerate(("dense", "dense_1")):
        names.append(f"{head}/kernel:0")
        values.append(rng.standard_normal((flat, latent)).astype(np.float32))
        names.append(f"{head}/bias:0")
        values.append(np.zeros((latent,), np.float32))
    return names, values


def _generator_stream(latent=32, image=64):
    """Era-plausible stream for the SPADE generator: Dense, 6 resblocks
    (spade_1, spade_2, conv_1, conv_2 [+ spade_3, conv_3]), 4x4 head.
    Every conv2d gets the next global creation index, like TF 2.x."""
    rng = np.random.default_rng(1)
    names, values = [], []
    state = {"conv": 0, "dense": 0}

    def dense(din, dout):
        suffix = f"_{state['dense']}" if state["dense"] else ""
        names.append(f"dense{suffix}/kernel:0")
        values.append(rng.standard_normal((din, dout)).astype(np.float32))
        names.append(f"dense{suffix}/bias:0")
        values.append(np.zeros((dout,), np.float32))
        state["dense"] += 1

    def conv(ci, co, k=3):
        suffix = f"_{state['conv']}" if state["conv"] else ""
        names.append(f"conv2d{suffix}/kernel:0")
        values.append(rng.standard_normal((k, k, ci, co)).astype(np.float32))
        names.append(f"conv2d{suffix}/bias:0")
        values.append(np.zeros((co,), np.float32))
        state["conv"] += 1

    def spade(filters):
        conv(2, 128)          # shared mask conv
        conv(128, filters)    # gamma
        conv(128, filters)    # beta

    sw = image // 64
    dense(latent, 16 * sw * sw * 64)
    plan_in = [1024, 1024, 1024, 1024, 512, 256]
    plan_out = [1024, 1024, 1024, 512, 256, 128]
    for b in range(6):
        spade(plan_in[b])                 # spade_1
        spade(plan_out[b])                # spade_2
        conv(plan_in[b], plan_out[b])     # conv_1
        conv(plan_out[b], plan_out[b])    # conv_2
        if plan_in[b] != plan_out[b]:
            spade(plan_in[b])             # spade_3
            conv(plan_in[b], plan_out[b])  # conv_3
    conv(128, 1, k=4)                     # head
    return names, values


def _swap(names, values, i, j):
    names = list(names)
    values = list(values)
    names[i], names[j] = names[j], names[i]
    values[i], values[j] = values[j], values[i]
    return names, values


class TestOrderedImport:
    def test_correct_order_imports(self):
        names, values = _generator_stream()
        params = generator_params_from_weights(names, values)
        assert set(params) == {"dense", "head"} | {
            f"resblock_{i}" for i in range(6)}
        # spot-check a mapping: resblock_0/conv_1 kernel is the stream's
        # conv at that creation position
        k = params["resblock_0"]["conv_1"]["kernel"]
        assert k.shape == (3, 3, 1024, 1024)

    def test_encoder_imports(self):
        names, values = _encoder_stream()
        params = encoder_params_from_weights(names, values)
        assert set(params) == {f"down_{i}" for i in range(5)} | {
            "mean", "variance"}


class TestShuffledStreamsFailLoudly:
    def test_same_shape_conv_swap_rejected(self):
        """resblock_0's conv_1 and conv_2 are both [3,3,1024,1024] —
        indistinguishable by shape.  A swapped stream must raise, not
        silently mis-map (the VERDICT's canonical case)."""
        names, values = _generator_stream()
        i = names.index("conv2d_6/kernel:0")   # rb0 conv_1 (after 2 spades)
        j = names.index("conv2d_7/kernel:0")   # rb0 conv_2
        assert values[i].shape == values[j].shape
        bad_n, bad_v = _swap(names, values, i, j)
        bad_n, bad_v = _swap(bad_n, bad_v, i + 1, j + 1)  # biases too
        with pytest.raises(ValueError, match="creation order"):
            generator_params_from_weights(bad_n, bad_v)

    def test_spade_block_swap_rejected(self):
        """Swapping two whole same-shape SPADE sub-layers (gamma vs beta
        conv of the same SPADE is undetectable even by name index — but
        swapping spade_1's gamma with spade_2's gamma is not)."""
        names, values = _generator_stream()
        i = names.index("conv2d_1/kernel:0")   # rb0 spade_1 gamma (1024)
        j = names.index("conv2d_4/kernel:0")   # rb0 spade_2 gamma (1024)
        assert values[i].shape == values[j].shape
        bad_n, bad_v = _swap(names, values, i, j)
        bad_n, bad_v = _swap(bad_n, bad_v, i + 1, j + 1)
        with pytest.raises(ValueError, match="creation order"):
            generator_params_from_weights(bad_n, bad_v)

    def test_cross_ndim_swap_rejected_by_shape(self):
        """Dense/conv swaps fail on the shape predicate even with no usable
        names."""
        names, values = _generator_stream()
        names = [None] * len(names)            # uninformative names
        i, j = 0, 2                            # dense kernel vs first conv
        bad_n, bad_v = _swap(names, values, i, j)
        with pytest.raises(ValueError, match="unexpected weight"):
            generator_params_from_weights(bad_n, bad_v)

    def test_encoder_conv_swap_rejected(self):
        names, values = _encoder_stream()
        i = names.index("conv2d_3/kernel:0")   # down_3 conv (256->512)
        j = names.index("conv2d_4/kernel:0")   # down_4 conv (512->512)
        bad_n, bad_v = _swap(names, values, i, j)
        with pytest.raises(ValueError):
            # either the order guard (name indices) or the downstream
            # shape mismatch — loud either way
            encoder_params_from_weights(bad_n, bad_v)
