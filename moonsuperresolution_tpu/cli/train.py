"""Unified training CLI — one command replaces the reference's six scripts.

    python -m moonsuperresolution_tpu.cli.train --recipe spade_256 \
        --path_h5 MoonORTO2DEM.hdf5 --path_trn MoonORTO2DEM_train.pkl \
        --path_val MoonORTO2DEM_val.pkl --output_path exp_spade

Recipes (config.py RECIPES) mirror the reference's hyperparameters:
spade_256, spade_512, spade_no_kl_512, cnn_256, cnn_512, pix2pix
(train_spade_256.py:13-24 and siblings).  Extras over the reference:
``--resume`` (true checkpoint resume), ``--synthetic`` (no-dataset smoke
run), ``--mesh data,model`` multi-chip sharding, ``--profile_dir``.
"""

from __future__ import annotations

import argparse
import dataclasses


def parse():
    p = argparse.ArgumentParser("moonsuperresolution_tpu trainer")
    p.add_argument("--recipe", type=str, default="spade_256")
    p.add_argument("--path_h5", type=str, default="")
    p.add_argument("--path_trn", type=str, default="")
    p.add_argument("--path_val", type=str, default="")
    p.add_argument("--output_path", type=str, default=".")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="train on generated terrain (no dataset needed)")
    p.add_argument("--mesh", type=str, default=None,
                   help="mesh shape 'DATA,MODEL', e.g. '4,2'")
    p.add_argument("--vgg_weights", type=str, default=None)
    p.add_argument("--profile_dir", type=str, default=None)
    p.add_argument("--max_steps_per_epoch", type=int, default=None)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 conv/matmul compute (params stay fp32)")
    p.add_argument("--grad_accum", type=int, default=None,
                   help="micro-steps per optimizer update (effective batch "
                        "= grad_accum * batch_size); for the bs2 512 recipes")
    p.add_argument("--distributed", action="store_true",
                   help="initialize the JAX multi-host runtime (auto-detect "
                        "cluster env, or use --coordinator/--num_processes/"
                        "--process_id / MOONSR_* env vars)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="coordinator address host:port for multi-host runs")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p.parse_args()


def main():
    from moonsuperresolution_tpu.config import RECIPES
    from moonsuperresolution_tpu.train.loop import train

    args = parse()
    if args.distributed or args.coordinator:
        from moonsuperresolution_tpu.parallel.distributed import initialize

        initialize(coordinator_address=args.coordinator,
                   num_processes=args.num_processes,
                   process_id=args.process_id)
    cfg = RECIPES[args.recipe]
    cfg = dataclasses.replace(
        cfg,
        output_path=args.output_path,
        seed=args.seed,
        data=dataclasses.replace(
            cfg.data, h5_path=args.path_h5, train_pkl=args.path_trn,
            val_pkl=args.path_val,
        ),
        **({"epochs": args.epochs} if args.epochs else {}),
        **({"batch_size": args.batch_size} if args.batch_size else {}),
        **({"vgg_weights_path": args.vgg_weights} if args.vgg_weights else {}),
        **({"grad_accum": args.grad_accum} if args.grad_accum else {}),
    )
    if args.bf16:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           compute_dtype="bfloat16"))
    mesh = None
    if args.mesh:
        from moonsuperresolution_tpu.parallel.mesh import make_mesh

        shape = tuple(int(x) for x in args.mesh.split(","))
        mesh = make_mesh(shape)
    train(cfg, resume=args.resume, synthetic=args.synthetic, mesh=mesh,
          profile_dir=args.profile_dir,
          max_steps_per_epoch=args.max_steps_per_epoch)


if __name__ == "__main__":
    main()
