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
    # Explicit opt-in: the persistent compile cache is off for CPU by
    # default (see utils/device.py), but these subprocesses recompile the
    # whole train/predict program set every run without it.
    from volume_segmantics_tpu.utils.device import compilation_cache_dir

    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.dirname(compilation_cache_dir()))
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


def test_resolve_training_phases(tmp_path, monkeypatch):
    """skip_frozen_without_pretrained folds frozen epochs into the unfrozen
    phase exactly when pretrained weights are requested-but-unavailable
    (VERDICT r3 #8; reference trainer :102-116 freeze rationale)."""
    from types import SimpleNamespace

    from volume_segmantics_tpu.models.pretrained import WEIGHTS_DIR_ENV
    from volume_segmantics_tpu.scripts.train_2d_model import (
        resolve_training_phases,
    )

    def mk(**kw):
        base = dict(
            num_cyc_frozen=8,
            num_cyc_unfrozen=5,
            model={"type": "U_Net", "encoder_name": "resnet34",
                   "encoder_weights": "imagenet"},
        )
        base.update(kw)
        return SimpleNamespace(**base)

    monkeypatch.delenv(WEIGHTS_DIR_ENV, raising=False)
    # Default off: parity schedule preserved even with no weights anywhere.
    assert resolve_training_phases(mk()) == (8, 5)
    # On + no weights cache: all 13 epochs run unfrozen.
    assert resolve_training_phases(
        mk(skip_frozen_without_pretrained=True)
    ) == (0, 13)
    # On + random init requested (encoder_weights: None): also folds.
    s = mk(skip_frozen_without_pretrained=True)
    s.model = {**s.model, "encoder_weights": None}
    assert resolve_training_phases(s) == (0, 13)
    # On + converted weights present in the cache: schedule untouched.
    (tmp_path / "resnet34.vstpu").write_bytes(b"stub")
    monkeypatch.setenv(WEIGHTS_DIR_ENV, str(tmp_path))
    assert resolve_training_phases(
        mk(skip_frozen_without_pretrained=True)
    ) == (8, 5)
