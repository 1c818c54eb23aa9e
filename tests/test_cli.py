"""End-to-end CLI tests: run the console scripts as subprocesses on tiny
volumes (the reference has no CLI tests — its e2e coverage is gpu-marked
trainer tests; here the actual user entry points are exercised)."""

import os
import subprocess
import sys
from pathlib import Path

import h5py
import numpy as np
import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent


def _run(args, cwd):
    env = dict(os.environ)
    env["VOLSEG_TPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    return subprocess.run(
        [sys.executable, "-m", *args], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=900,
    )


@pytest.fixture()
def cli_workspace(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.integers(0, 255, (16, 48, 40)).astype(np.uint8)
    labels = (vol > 128).astype(np.uint8)
    with h5py.File(tmp_path / "d.h5", "w") as f:
        f["/data"] = vol
    with h5py.File(tmp_path / "l.h5", "w") as f:
        f["/data"] = labels
    settings_dir = tmp_path / "volseg-settings"
    settings_dir.mkdir()
    train = yaml.safe_load((REPO / "volseg-settings" / "2d_model_train_settings.yaml").read_text())
    train.update(
        image_size=64, batch_size=8, compute_dtype="float32",
        num_cyc_frozen=1, num_cyc_unfrozen=0, lr_find_epochs=1,
        slice_to_disk=False,
    )
    (settings_dir / "2d_model_train_settings.yaml").write_text(yaml.safe_dump(train))
    pred = yaml.safe_load((REPO / "volseg-settings" / "2d_model_predict_settings.yaml").read_text())
    pred.update(compute_dtype="float32", prediction_batch_size=8, quality="low")
    (settings_dir / "2d_model_predict_settings.yaml").write_text(yaml.safe_dump(pred))
    return tmp_path


@pytest.mark.slow
def test_train_then_predict_cli(cli_workspace):
    r = _run(
        ["volume_segmantics_tpu.scripts.train_2d_model",
         "--data", "d.h5", "--labels", "l.h5", "--data_dir", str(cli_workspace)],
        cwd=cli_workspace,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    models = list(cli_workspace.glob("*.pytorch"))
    assert len(models) == 1
    assert list(cli_workspace.glob("*_loss_plot.png"))
    assert list(cli_workspace.glob("*_train_stats.csv"))
    assert list(cli_workspace.glob("*_prediction_image.png"))

    r = _run(
        ["volume_segmantics_tpu.scripts.predict_2d_model",
         models[0].name, "d.h5", "--data_dir", str(cli_workspace)],
        cwd=cli_workspace,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    preds = list(cli_workspace.glob("*_2d_model_vol_pred.h5"))
    assert len(preds) == 1
    with h5py.File(preds[0]) as f:
        out = f["/data"][()]
    assert out.shape == (16, 48, 40)
    assert out.dtype == np.uint8


def test_cli_error_paths(cli_workspace):
    r = _run(
        ["volume_segmantics_tpu.scripts.predict_2d_model", "model.txt", "d.h5"],
        cwd=cli_workspace,
    )
    assert r.returncode == 2
    assert "Wrong filetype" in r.stderr

    r = _run(
        ["volume_segmantics_tpu.scripts.train_2d_model",
         "--data", "missing.h5", "--labels", "l.h5"],
        cwd=cli_workspace,
    )
    assert r.returncode == 2
    assert "does not appear to exist" in r.stderr
