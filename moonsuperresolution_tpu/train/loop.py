"""Training loop: epochs, TensorBoard logging, checkpoint/resume, profiling.

Replaces the reference's six near-identical script bodies
(train_spade_256.py:70-114 and siblings) with one loop driven by a recipe
config.  Differences by design (SURVEY.md §5):

- true resume: the Orbax checkpoint holds params + both optimizer states +
  step, and the loop restarts from the saved epoch (the reference always
  restarts at epoch 0 and saves only Keras SavedModels).
- TensorBoard tags mirror the reference exactly (GT / pred / input_hmap /
  input_image images, per-loss scalars, train/ and test/ writers,
  train_spade_256.py:63-90) so existing TB workflows carry over.
- optional ``jax.profiler`` trace of the first logged step of an epoch.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from moonsuperresolution_tpu.config import TrainConfig
from moonsuperresolution_tpu.data.sampler import (
    BatchPrefetcher,
    SyntheticSampler,
    TileSampler,
    augment_batch,
)
from moonsuperresolution_tpu.train.trainers import make_trainer
from moonsuperresolution_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)
from moonsuperresolution_tpu.utils.colorize import colorize


class TBLogger:
    """Thin tensorboardX wrapper; no-ops when logging is disabled.

    Metric-name mapping vs the reference's TensorBoard tags: ours are
    semantic.  The reference logs the *normal-vector* loss under the tag
    "grad_loss" and the *gradient* loss under "norm_loss" — the names are
    swapped at model.py:84-85 (same swap in CNNSpade, model.py:682-683;
    SURVEY §0.2).  Here ``norm_loss`` is always the surface-normal cosine
    loss and ``grad_loss`` the image-gradient L1 loss.
    """

    def __init__(self, log_dir: Optional[str]):
        self.writer = None
        if log_dir:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(log_dir)

    def scalars(self, metrics: dict, step: int):
        if self.writer:
            for k, v in metrics.items():
                self.writer.add_scalar(k, float(v), step)

    def images(self, x, y_true, y_pred, step: int, max_outputs: int = 3):
        """The reference's 4 image panels, jet-colorized
        (train_spade_256.py:80-90)."""
        if not self.writer:
            return
        n = min(max_outputs, x.shape[0])
        for i in range(n):
            self.writer.add_image(
                f"GT/{i}", colorize(np.asarray(y_true[i])), step,
                dataformats="HWC")
            self.writer.add_image(
                f"pred/{i}", colorize(np.asarray(y_pred[i])), step,
                dataformats="HWC")
            self.writer.add_image(
                f"input_hmap/{i}", colorize(np.asarray(x[i][..., 1])), step,
                dataformats="HWC")
            self.writer.add_image(
                f"input_image/{i}",
                np.clip(np.asarray(x[i][..., :1]) + 0.5, 0, 1), step,
                dataformats="HWC")

    def flush(self):
        if self.writer:
            self.writer.flush()


def _mean_metrics(acc: list[dict]) -> dict:
    out = {}
    for k in acc[0]:
        out[k] = float(np.mean([float(m[k]) for m in acc]))
    return out


def train(
    cfg: TrainConfig,
    resume: bool = False,
    synthetic: bool = False,
    max_steps_per_epoch: Optional[int] = None,
    mesh=None,
    log: bool = True,
    profile_dir: Optional[str] = None,
):
    """Run the full training recipe; returns (trainer, final_state, history).

    Multi-host: call ``parallel.distributed.initialize`` first (cli/train
    does with --coordinator/--num_processes/--process_id); each process then
    loads a disjoint dataset slice and contributes its local shard of the
    global batch, TB/console logging runs on process 0 only, and every
    process executes the same jitted step over the global mesh.
    """
    pindex, pcount = jax.process_index(), jax.process_count()
    if pcount > 1:
        if mesh is None:
            raise ValueError("multi-process training requires a mesh")
        if cfg.batch_size % pcount:
            raise ValueError(
                f"global batch_size {cfg.batch_size} must divide by "
                f"process count {pcount}")
        log = log and pindex == 0
    local_bs = cfg.batch_size // pcount
    run_name = time.strftime("%Y%m%d-%H%M%S")
    out = cfg.output_path
    model_dir = os.path.join(out, "models", run_name)
    ckpt_dir = os.path.join(out, "checkpoints")
    os.makedirs(model_dir, exist_ok=True)
    os.makedirs(ckpt_dir, exist_ok=True)
    tb_train = TBLogger(os.path.join(out, "tensorboard", run_name, "train")
                        if log else None)
    tb_val = TBLogger(os.path.join(out, "tensorboard", run_name, "test")
                      if log else None)

    trainer = make_trainer(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    state = trainer.init(rng)
    resumed = False
    latest = os.path.join(ckpt_dir, "latest")
    if resume and os.path.isdir(latest):
        state = restore_checkpoint(latest, template=state)
        resumed = True

    if mesh is not None:
        from moonsuperresolution_tpu.parallel.distributed import global_batch
        from moonsuperresolution_tpu.parallel.mesh import shard_state_for_dp_tp

        state = shard_state_for_dp_tp(state, mesh)
        if cfg.batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {cfg.batch_size} must divide by the data axis "
                f"({mesh.shape['data']})"
            )

        def _to_device(x, y):
            # local (per-process) shards -> one global data-sharded array
            return global_batch((np.asarray(x), np.asarray(y)), mesh)
    else:
        def _to_device(x, y):
            return jnp.asarray(x), jnp.asarray(y)

    if synthetic:
        trn = SyntheticSampler(hw=cfg.model.image_size,
                               seed=cfg.seed + 1000 * pindex)
        val = SyntheticSampler(hw=cfg.model.image_size,
                               seed=cfg.seed + 1 + 1000 * pindex)
    else:
        d = cfg.data
        trn = TileSampler(d.h5_path, d.train_pkl, hw=cfg.model.image_size,
                          upscaling=cfg.model.upscaling_factor, seed=cfg.seed,
                          process_index=pindex, process_count=pcount)
        val = TileSampler(d.h5_path, d.val_pkl, hw=cfg.model.image_size,
                          upscaling=cfg.model.upscaling_factor,
                          seed=cfg.seed + 1,
                          process_index=pindex, process_count=pcount)

    steps = max_steps_per_epoch or _steps_per_epoch(cfg, synthetic, trn)
    start_epoch = 0
    if resumed:
        start_epoch = int(state.step) // max(1, steps)
        print(f"resumed from step {int(state.step)} (epoch {start_epoch})")
    log_every = max(1, int(steps * cfg.log_every_frac))
    aug_rng = np.random.default_rng(cfg.seed)
    history = []

    for epoch in range(start_epoch, cfg.epochs):
        # ---- train
        t0 = time.time()
        it = _epoch_batches(trn, local_bs, steps, synthetic)
        if pcount > 1:
            # bound every process to the agreed step count (ragged local
            # shards would otherwise desynchronize the collectives)
            import itertools

            it = itertools.islice(it, steps)
        train_acc = []
        for step, (x, y) in enumerate(BatchPrefetcher(it, depth=4)):
            x, y = augment_batch(x, y, aug_rng)
            step_rng = jax.random.fold_in(rng, int(state.step))
            xd, yd = _to_device(x, y)
            if profile_dir and epoch == start_epoch and step == 1:
                with jax.profiler.trace(profile_dir):
                    state, metrics, fake = trainer.train_step(
                        state, xd, yd, step_rng)
                    jax.block_until_ready(fake)
            else:
                state, metrics, fake = trainer.train_step(
                    state, xd, yd, step_rng)
            train_acc.append(metrics)
            if step % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                gstep = int(state.step)
                print(f"epoch {epoch + 1} step {step}/{steps} "
                      + " ".join(f"{k}={v:.4f}" for k, v in m.items()),
                      flush=True)
                tb_train.scalars(m, gstep)
                tb_train.images(x, y, np.asarray(fake), gstep)
                tb_train.flush()

        # ---- validate (full pass, train_spade_256.py:92-100)
        val_acc = []
        vx = vy = vf = None
        val_it = _epoch_batches(val, local_bs, max(1, steps // 10), synthetic)
        if pcount > 1:
            import itertools

            val_it = itertools.islice(val_it, max(1, steps // 10))
        for vx, vy in BatchPrefetcher(val_it, depth=2):
            vxd, vyd = _to_device(vx, vy)
            vm, vf = trainer.val_step(state.params, vxd, vyd,
                                      jax.random.fold_in(rng, 2**31 + epoch))
            val_acc.append(vm)
        if val_acc:
            vmean = _mean_metrics(val_acc)
            gstep = int(state.step)
            print(f"epoch {epoch + 1} VAL "
                  + " ".join(f"{k}={v:.4f}" for k, v in vmean.items()),
                  flush=True)
            tb_val.scalars(vmean, gstep)
            if vx is not None:
                tb_val.images(vx, vy, np.asarray(vf), gstep, max_outputs=9)
            tb_val.flush()
            history.append({"epoch": epoch,
                            "train": _mean_metrics(train_acc),
                            "val": vmean,
                            "seconds": time.time() - t0})

        # ---- checkpoint (per-epoch, with resume state)
        if (epoch + 1) % cfg.checkpoint_every_epochs == 0:
            save_checkpoint(latest, jax.device_get(state))
            save_checkpoint(os.path.join(model_dir, f"epoch_{epoch}"),
                            jax.device_get(state.params))

    return trainer, state, history


def _steps_per_epoch(cfg, synthetic, sampler=None):
    if synthetic:
        return 8
    if sampler is None:
        return 1
    # Identical on every process (collective steps must agree across hosts):
    # derived from the GLOBAL sample count, floored to the shortest local
    # shard, in units of the global batch.
    pc = getattr(sampler, "process_count", 1)
    n_min_local = sampler.global_num_samples // pc
    return max(1, n_min_local // (cfg.batch_size // pc))


def _epoch_batches(sampler, bs, steps, synthetic):
    if synthetic:
        return sampler.batches(bs, steps)
    return sampler.batches(bs, shuffle=True)
