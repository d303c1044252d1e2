"""CLI surface tests: argument parsing and config plumbing (no training)."""

import sys

import pytest


def test_train_cli_parses(monkeypatch):
    from moonsuperresolution_tpu.cli import train as cli

    monkeypatch.setattr(sys, "argv", [
        "train", "--recipe", "cnn_256", "--path_h5", "x.h5",
        "--path_trn", "t.pkl", "--path_val", "v.pkl",
        "--output_path", "/tmp/o", "--epochs", "2", "--batch_size", "4",
    ])
    args = cli.parse()
    assert args.recipe == "cnn_256"
    assert args.epochs == 2 and args.batch_size == 4


def test_recipes_cover_all_reference_scripts():
    """One preset per reference training script (SURVEY.md §2.1)."""
    from moonsuperresolution_tpu.config import RECIPES

    assert set(RECIPES) == {
        "spade_256", "spade_512", "spade_no_kl_512",
        "cnn_256", "cnn_512", "pix2pix",
    }
    # hyperparameters match the reference script bodies
    assert RECIPES["spade_256"].batch_size == 16
    assert RECIPES["spade_256"].epochs == 300
    assert RECIPES["spade_512"].batch_size == 2
    assert RECIPES["cnn_256"].batch_size == 32
    assert RECIPES["cnn_256"].epochs == 100
    assert RECIPES["cnn_256"].model.vgg_feature_loss_coeff == 1e-4
    assert RECIPES["spade_no_kl_512"].model.feature_loss_coeff == 5.0
    assert RECIPES["pix2pix"].optimizer.gen_lr == 2e-4
    assert RECIPES["pix2pix"].optimizer.beta1 == 0.5


def test_process_cli_parses(monkeypatch):
    from moonsuperresolution_tpu.cli import process_full_tiles as cli

    monkeypatch.setattr(sys, "argv", [
        "p", "--source_folder_path", "/maps", "--map_name", "m",
        "--save_path", "/out", "--image_size", "512", "--stride", "64",
        "--batch_size", "12", "--num_shards", "4", "--shard_index", "1",
    ])
    a = cli.parse()
    assert a.image_size == 512 and a.stride == 64
    assert a.model_path is None  # identity mode by default
    assert a.num_shards == 4 and a.shard_index == 1


def test_colorize_matches_matplotlib(rng):
    import matplotlib
    import numpy as np

    from moonsuperresolution_tpu.utils.colorize import colorize

    x = rng.random((8, 8)).astype(np.float32)
    out = colorize(x, cmap="jet")
    assert out.shape == (8, 8, 3)
    lut = matplotlib.colormaps["jet"](np.arange(256))[:, :3]
    idx = np.clip(np.round((x - x.min()) / (x.max() - x.min()) * 255),
                  0, 255).astype(int)
    np.testing.assert_allclose(out, lut[idx], atol=1e-6)


def test_compare_maps(rng):
    import numpy as np

    from moonsuperresolution_tpu.cli.compare_maps import compare

    a = (rng.random((50, 60)) * 100 + 1000).astype(np.float32)
    b = a + rng.standard_normal((50, 60)).astype(np.float32) * 0.1
    a[0, 0] = -32768.0  # nodata excluded
    stats = compare(a, b, -32768.0)
    assert 0.05 < stats["rmse"] < 0.2
    assert stats["coverage"] < 1.0
    # identical maps -> zero
    z = compare(b, b, -32768.0)
    assert z["rmse"] == 0.0 and z["rmse_pct_of_range"] == 0.0
