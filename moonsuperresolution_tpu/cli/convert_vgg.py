"""Convert pretrained VGG19 weights into the framework's flax .npz format.

The reference trains its perceptual loss against Keras' imagenet VGG19
(spade/losses.py:56-80).  This environment has no network egress, so the
weights must be brought in as a file; the moment one exists, convert it
here and pass the output to ``--vgg_weights`` / ``TrainConfig.
vgg_weights_path`` — the trainers then optimize the reference's exact
perceptual objective (they warn loudly when falling back to random
features).

Accepted inputs:
- Keras ``.h5`` weight files (keras.applications.VGG19, include_top
  irrelevant — only the conv trunk is read);
- torchvision ``vgg19`` state dicts (``.pth``/``.pt``), converted
  OIHW -> HWIO.  NOTE: torchvision's VGG19 expects [0,1]-scaled RGB
  normalized with imagenet mean/std, NOT caffe preprocessing — features
  differ from the Keras weights the reference used, so prefer the .h5.

    python -m moonsuperresolution_tpu.cli.convert_vgg \
        --input vgg19_weights.h5 --output vgg19.npz
"""

from __future__ import annotations

import argparse


def convert_torch_vgg19(pth_path: str):
    """torchvision vgg19 state dict -> flax param dict (OIHW -> HWIO)."""
    import numpy as np
    import torch

    from moonsuperresolution_tpu.models.vgg import _BLOCKS

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # torchvision indexes features sequentially: conv layers sit at fixed
    # offsets within each block (conv, relu pairs + one maxpool per block).
    params = {}
    idx = 0
    for b, (n_convs, _ch) in enumerate(_BLOCKS):
        for c in range(n_convs):
            w = sd[f"features.{idx}.weight"].numpy()  # OIHW
            bias = sd[f"features.{idx}.bias"].numpy()
            params[f"block{b + 1}_conv{c + 1}"] = {
                "kernel": np.transpose(w, (2, 3, 1, 0)),  # -> HWIO
                "bias": bias,
            }
            idx += 2  # conv + relu
        idx += 1  # maxpool
    return params


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help=".h5 (Keras) or .pth/.pt (torchvision) weights")
    p.add_argument("--output", required=True, help="output .npz path")
    a = p.parse_args(argv)

    from moonsuperresolution_tpu.models import vgg as vggmod

    if a.input.endswith((".pth", ".pt")):
        params = convert_torch_vgg19(a.input)
    else:
        params = vggmod.load_keras_vgg19_weights(a.input)
    vggmod.save_vgg19_npz(params, a.output)
    n = sum(p["kernel"].size + p["bias"].size for p in params.values())
    print(f"wrote {a.output}: {len(params)} conv layers, {n:,} parameters")


if __name__ == "__main__":
    main()
