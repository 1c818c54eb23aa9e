"""Trainer integration tests (reference tests/test_vol_seg_2d_trainer.py
equivalent: 1-epoch end-to-end run asserting model file + loss plot +
prediction figure exist)."""

import numpy as np
import pytest

from volume_segmantics_tpu.model import VolSeg2dTrainer


@pytest.fixture()
def fast_settings(training_settings):
    training_settings.num_cyc_frozen = 1
    training_settings.num_cyc_unfrozen = 0
    training_settings.patience = 2
    training_settings.lr_find_epochs = 1
    return training_settings


@pytest.fixture()
def trainer(image_dir, label_dir, fast_settings):
    return VolSeg2dTrainer(image_dir, label_dir, 4, fast_settings)


@pytest.mark.slow
class TestTrainer:
    def test_init(self, trainer):
        assert trainer.label_no == 4
        bs = trainer.training_loader.batch_size
        # batch size is rounded up to a multiple of the device count (8
        # virtual CPU devices in tests)
        assert bs % 8 == 0
        assert len(trainer.training_loader) == 16 // bs
        assert len(trainer.validation_loader) == -(-4 // bs)

    def test_freeze_mask(self, trainer):
        import jax

        from volume_segmantics_tpu.model.operations.vol_seg_2d_trainer import (
            _freeze_mask,
        )

        trainer._create_model_and_optimiser(1e-4, frozen=True)
        mask = _freeze_mask(trainer.bundle.params, True)
        leaves = jax.tree_util.tree_leaves(mask)
        assert 0.0 in leaves and 1.0 in leaves
        unfrozen = _freeze_mask(trainer.bundle.params, False)
        assert all(l == 1.0 for l in jax.tree_util.tree_leaves(unfrozen))

    def test_one_epoch_end_to_end(self, trainer, tmp_path):
        model_out = tmp_path / "model.pytorch"
        trainer.train_model(model_out, 1, 2, create=True, frozen=True)
        assert model_out.exists()
        assert len(trainer.avg_train_losses) == 1
        assert np.isfinite(trainer.avg_train_losses[0])
        trainer.output_loss_fig(model_out)
        trainer.output_prediction_figure(model_out)
        assert (tmp_path / "model_loss_plot.png").exists()
        assert (tmp_path / "model_train_stats.csv").exists()
        assert (tmp_path / "model_prediction_image.png").exists()

    def test_warm_start_second_phase(self, trainer, tmp_path):
        model_out = tmp_path / "model.pytorch"
        trainer.train_model(model_out, 1, 2, create=True, frozen=True)
        trainer.train_model(model_out, 1, 2, create=False, frozen=False)
        assert len(trainer.avg_train_losses) == 2


@pytest.mark.slow
def test_trainer_from_slicer_in_memory(fast_settings, tmp_path):
    """Zero-disk path: slicer -> trainer without PNG export."""
    from volume_segmantics_tpu.data import TrainingDataSlicer

    fast_settings.clip_data = False
    rng = np.random.default_rng(0)
    vol = rng.integers(0, 255, (10, 20, 24)).astype(np.uint8)
    labels = (vol > 128).astype(np.uint8)
    slicer = TrainingDataSlicer(vol, labels, fast_settings)
    trainer = VolSeg2dTrainer.from_slicer(slicer, slicer.num_seg_classes, fast_settings)
    assert len(trainer.training_loader.indices) > 0
    model_out = tmp_path / "mem_model.pytorch"
    trainer.train_model(model_out, 1, 2, create=True, frozen=True)
    assert model_out.exists()


@pytest.mark.slow
def test_autosave_resume(image_dir, label_dir, fast_settings, tmp_path):
    """Preemption tolerance: an interrupted multi-epoch run resumes from
    the last completed epoch via the .autosave file."""
    fast_settings.autosave = True
    trainer = VolSeg2dTrainer(image_dir, label_dir, 4, fast_settings)
    model_out = tmp_path / "model.pytorch"
    autosave = tmp_path / "model.pytorch.autosave"

    # Simulate an interruption after epoch 1 of a 3-epoch run: patch the
    # epoch loop to raise after the autosave write.
    calls = {"n": 0}
    orig = trainer._write_autosave

    def interrupting(*args, **kwargs):
        orig(*args, **kwargs)
        calls["n"] += 1
        if calls["n"] == 1:
            raise KeyboardInterrupt

    trainer._write_autosave = interrupting
    with pytest.raises(KeyboardInterrupt):
        trainer.train_model(model_out, 3, 3, create=True, frozen=True)
    assert autosave.exists()
    assert len(trainer.avg_train_losses) == 1

    # Fresh trainer resumes from epoch 2 (no LR finder rerun) and finishes.
    trainer2 = VolSeg2dTrainer(image_dir, label_dir, 4, fast_settings)
    trainer2.train_model(model_out, 3, 3, create=True, frozen=True)
    assert len(trainer2.avg_train_losses) == 3  # 1 restored + 2 new
    assert not autosave.exists()  # cleaned up on completion
    assert model_out.exists()


class TestLrFinderMath:
    """_find_lr_from_graph parity (reference trainer :347-383)."""

    def test_min_gradient_pick(self):
        import volume_segmantics_tpu.utils.config as cfg

        lrs = [10 ** (-6 + i * 0.1) for i in range(60)]
        # Loss falls fastest around index 40
        losses = [1.0 - 0.5 * np.exp(-((i - 40) ** 2) / 20) for i in range(60)]
        lr = VolSeg2dTrainer._find_lr_from_graph(losses, lrs)
        grad_min_idx = int(np.argmin(np.gradient(np.array(losses))))
        assert np.isclose(lr, lrs[grad_min_idx] / cfg.LR_DIVISOR)

    def test_positive_gradient_falls_back(self):
        import volume_segmantics_tpu.utils.config as cfg

        losses = [0.1 * i for i in range(10)]  # strictly increasing
        lrs = [1e-6 * (i + 1) for i in range(10)]
        assert VolSeg2dTrainer._find_lr_from_graph(losses, lrs) == cfg.DEFAULT_MIN_LR


def test_elastic_field_amplitude():
    """The low-res elastic noise trick must preserve albumentations'
    displacement magnitude: std(blur(U(-1,1), sigma)) ~ 0.577/(2*sigma*sqrt(pi))."""
    import jax

    from volume_segmantics_tpu.ops.augment import ELASTIC_SIGMA, _smooth_noise_field

    fields = [
        np.asarray(_smooth_noise_field(jax.random.PRNGKey(i), 256)) for i in range(8)
    ]
    measured = float(np.std(np.stack(fields)))
    theory = (1 / np.sqrt(3)) / (2 * ELASTIC_SIGMA * np.sqrt(np.pi))
    assert 0.5 * theory < measured < 2.0 * theory, (measured, theory)
