"""WAC mosaic tiler CLI — provides the reference's missing tile_WAC_MOS.py
step (README.md:117).

    python -m moonsuperresolution_tpu.cli.tile_wac \
        --mosaic data/Lunar_LRO_LROC-WAC_Mosaic_global_100m_June2013.tif \
        --output_path data
"""

from __future__ import annotations

import argparse


def main():
    from moonsuperresolution_tpu.data.wac_tiler import tile_wac_mosaic

    p = argparse.ArgumentParser("WAC global mosaic -> 6 regional .npy arrays")
    p.add_argument("--mosaic", type=str, required=True)
    p.add_argument("--output_path", type=str, default=".")
    a = p.parse_args()
    for path in tile_wac_mosaic(a.mosaic, a.output_path):
        print("wrote", path)


if __name__ == "__main__":
    main()
