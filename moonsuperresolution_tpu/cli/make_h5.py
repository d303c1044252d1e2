"""Dataset build CLI (reference: make_h5.py CLI).

    python -m moonsuperresolution_tpu.cli.make_h5 --data_path data --output_path .
"""

from __future__ import annotations

import argparse


def main():
    from moonsuperresolution_tpu.data.h5_builder import build_h5_dataset

    p = argparse.ArgumentParser("HDF5 tile-store builder")
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--output_path", type=str, default=".")
    p.add_argument("--seed", type=int, default=None)
    a = p.parse_args()
    h5_path, n_train, n_val = build_h5_dataset(a.data_path, a.output_path,
                                               seed=a.seed)
    print(f"wrote {h5_path}: {n_train} train / {n_val} val tiles")


if __name__ == "__main__":
    main()
