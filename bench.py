#!/usr/bin/env python
"""Driver benchmark: the full BASELINE.json metric set in one JSON line.

BASELINE.json names "train slices/sec/chip; 256³ high-quality predict
wall-clock; Dice parity". This script measures, on the attached device:

1. `unet_resnet34_12way_tta_predict_256cube_wallclock` — the headline
   north-star (< 10 s on one v5e chip); best of up to 4 timed runs (the
   shared host<->device tunnel's bandwidth fluctuates >100x between
   quiet and contended minutes, so min estimates the machine, not the
   neighbours — same policy as the train stage's best-of-3 windows).
2. `predict_512cube_12way_wallclock_s` — the reference tutorial's predict
   workload scale (reference training_data/README.md:19).
3. `train_slices_per_sec_chip` — fused train step (augmentation + forward +
   backward + AdamW) at perf batch 32 and the reference's parity batch 12,
   plus `train_mfu_pct` (model-FLOPs utilisation: 3x forward FLOPs from the
   compiled forward's XLA cost analysis over the device's peak bf16 rate).
4. `tutorial_dice` + `tutorial_train_wallclock_s_{parity,throughput}` —
   end-to-end training on the synthetic vessels volume
   (tools/make_tutorial_data.py) with the REFERENCE default schedule
   (8 frozen + 5 unfrozen epochs, patience 3) in both performance
   profiles, each followed by 12-way prediction scored as binary Dice
   against the ground-truth labels.
5. `train_slices_per_sec_chip_frozen_b128` / `train_frozen_speedup_b128`
   — the frozen-phase step (encoder backward DCE'd via the zero freeze
   mask) vs the unfrozen step.
6. `predict_768cube_stream_*` — beyond-HBM slab-streaming predictor on a
   768^3 volume with before/after peak-device-memory evidence of the
   constant footprint.

Robustness contract (VERDICT r3 #1): this script ALWAYS prints exactly one
JSON line and exits 0. Backend initialisation runs first in a SUBPROCESS
with a hard timeout (a hung PJRT plugin init cannot stall the bench) and
bounded retries with backoff; if the backend never comes up, or any stage
fails unrecoverably, the line carries an "error" field instead of silently
producing no parseable record.
"""

import json
import logging
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

logging.basicConfig(level=logging.WARNING)

# Liveness tracking for the in-process stall watchdog: every stage-progress
# stderr print and every package log record bumps the timestamp. A wedged
# tunnel RPC (observed: a train-step compile request that never returned
# while a fresh client compiled the same program in 13 s) makes NO progress
# for the rest of the run; the watchdog converts that from a silent
# full-deadline burn into a prompt partial report + a fresh-process retry.
_PROGRESS = {"t": time.time()}


class _LivenessStderr:
    """Proxy for sys.stderr: any Python-side stderr write (the `#` stage
    notes throughout this script) counts as liveness. Installed by the inner
    run only; logging handlers hold the original stream object, so package
    logs are tracked separately by `_ProgressLogHandler`."""

    def __init__(self, base):
        self._base = base

    def write(self, s):
        if s.strip():
            _PROGRESS["t"] = time.time()
        return self._base.write(s)

    def flush(self):
        return self._base.flush()

    def __getattr__(self, attr):  # pragma: no cover - passthrough
        return getattr(self._base, attr)


class _ProgressLogHandler(logging.Handler):
    """Counts any package/trainer log record (e.g. the per-epoch INFO lines
    during the tutorial-Dice stage) as liveness."""

    def emit(self, record):  # pragma: no cover - trivial
        _PROGRESS["t"] = time.time()

TARGET_SECONDS = 10.0
CACHE_DIR = Path("/root/.cache/volseg_bench")

HEADLINE = "unet_resnet34_12way_tta_predict_256cube_wallclock"

# Peak dense bf16 matmul throughput per chip, by device_kind substring.
# Sources: public TPU spec sheets (v4 275, v5e 197, v5p 459, v6e 918 TFLOP/s).
PEAK_BF16_FLOPS = (
    ("v6", 918e12),
    ("v5p", 459e12),
    ("v5 lite", 197.0e12),
    ("v5e", 197.0e12),
    ("v5litepod", 197.0e12),
    ("v5", 459e12),  # plain "TPU v5" -> v5p
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def _peak_flops(device_kind: str):
    dk = device_kind.lower()
    for sub, peak in PEAK_BF16_FLOPS:
        if sub in dk:
            return peak
    return None


def _emit(value, extra, error=None):
    """The ONE output line, in the driver schema. Never raises."""
    rec = {
        "metric": HEADLINE,
        "value": value,
        "unit": "s",
        "vs_baseline": (round(TARGET_SECONDS / value, 3) if value else None),
        "extra": extra,
    }
    if error:
        rec["error"] = error
    print(json.dumps(rec))


_PROBE_SRC = """
import os, sys
import jax
try:
    # Honour VOLSEG_TPU_PLATFORM (the image's TPU plugin ignores the
    # JAX_PLATFORMS env var, so CPU fallback must go through the config API).
    from volume_segmantics_tpu.utils.device import configure_platform
    configure_platform()
except Exception:
    pass
ds = jax.devices()
# device_kind may contain spaces ("TPU v5 lite") -> print it LAST.
print("OK", ds[0].platform, len(ds), getattr(ds[0], "device_kind", "?"))
"""


def probe_backend(attempts=None, probe_timeout=None, backoff=None):
    """Initialise JAX in a subprocess (so a hung plugin init is killable)
    with bounded retries. Returns (platform, device_kind) or (None, reason).
    """
    attempts = attempts or int(os.environ.get("VOLSEG_BENCH_PROBE_ATTEMPTS", 4))
    probe_timeout = probe_timeout or int(
        os.environ.get("VOLSEG_BENCH_PROBE_TIMEOUT", 300)
    )
    backoff = backoff or int(os.environ.get("VOLSEG_BENCH_PROBE_BACKOFF", 30))
    reason = "unknown"
    for i in range(attempts):
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True,
                text=True,
                timeout=probe_timeout,
                env={**os.environ},
            )
            out = r.stdout.strip().splitlines()
            ok = [ln for ln in out if ln.startswith("OK ")]
            if r.returncode == 0 and ok:
                _, platform, n, kind = ok[0].split(" ", 3)
                print(
                    f"# backend probe ok in {time.time() - t0:.0f}s: "
                    f"{platform} {kind} x{n}",
                    file=sys.stderr,
                )
                return platform, kind
            reason = f"probe rc={r.returncode}: {(r.stderr or r.stdout)[-300:]}"
        except subprocess.TimeoutExpired:
            reason = f"probe timed out after {probe_timeout}s"
        except Exception as e:  # pragma: no cover
            reason = f"probe error: {e}"
        if i + 1 < attempts:
            print(
                f"# backend probe attempt {i + 1}/{attempts} failed "
                f"({reason}); retrying in {backoff}s",
                file=sys.stderr,
            )
            time.sleep(backoff)
        else:
            print(
                f"# backend probe attempt {i + 1}/{attempts} failed "
                f"({reason}); giving up",
                file=sys.stderr,
            )
    return None, reason


def _tutorial_volumes(side=256):
    """Synthetic vessels data+labels, cached across bench runs."""
    CACHE_DIR.mkdir(parents=True, exist_ok=True)
    # Key by every generation parameter so generator changes invalidate.
    cache = CACHE_DIR / f"vessels{side}_n30_s0_v2.npz"
    if cache.exists():
        blob = np.load(cache)
        return blob["data"], blob["labels"]
    sys.path.insert(0, str(Path(__file__).parent))
    from tools.make_tutorial_data import make_vessel_volume

    data, labels = make_vessel_volume(side, n_vessels=30, seed=0)
    np.savez_compressed(cache, data=data, labels=labels)
    return data, labels


def _best_time(fn, n=4, budget_s=300.0):
    """Best of n timed runs. The shared chip's host<->device tunnel
    fluctuates >100x between quiet and contended minutes (measured:
    the same 128 MB device_put takes 0.12 s or 20+ s); like the train
    stage's best-of-3 windows, the wall-clock metric is about the
    machine's capability, not the neighbours', so min is the right
    estimator. Runs stop early if three runs already agree within 10%
    (quiet tunnel), or once `budget_s` of cumulative time is spent (a
    congested tunnel must not wedge the bench), to keep the run inside
    the driver budget."""
    times = []
    t_start = time.perf_counter()
    for i in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
        if i >= 2 and sorted(times)[1] < 1.1 * min(times):
            break
        if time.perf_counter() - t_start > budget_s:
            break
    return min(times)


def _probe_tunnel(mb=1.0, timeout_s=30.0):
    """Measure host->device and device->host tunnel bandwidth with a small
    transfer, each side bounded by `timeout_s` via a watchdog thread (a
    fully stalled link otherwise blocks forever — observed on the shared
    tunnel). Returns (up_MBps, down_MBps); a timed-out side reports 0.0."""
    import threading

    import jax

    res = {}

    def work():
        x = np.zeros(int(mb * 1e6), np.uint8)
        t0 = time.perf_counter()
        d = jax.device_put(x)
        jax.block_until_ready(d)
        res["up"] = mb / max(time.perf_counter() - t0, 1e-9)
        t0 = time.perf_counter()
        np.asarray(d)
        res["down"] = mb / max(time.perf_counter() - t0, 1e-9)

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(timeout_s)
    return res.get("up", 0.0), res.get("down", 0.0)


def _wait_quiet_tunnel(extra, min_down_mbps=10.0, attempts=8, wait_s=40):
    """Gate the transfer-sensitive predict stages on a quiet tunnel: probe
    the downlink and wait (bounded) for it to exceed `min_down_mbps`.
    Records the last probe in `extra` either way — a congested capture is
    then interpretable (the wall-clock includes neighbour traffic) instead
    of silently mis-measuring the machine."""
    up = down = 0.0
    for i in range(attempts):
        up, down = _probe_tunnel()
        if down >= min_down_mbps:
            break
        print(
            f"# tunnel congested (down {down:.1f} MB/s < {min_down_mbps}); "
            f"waiting {wait_s}s ({i + 1}/{attempts})",
            file=sys.stderr,
        )
        if i + 1 < attempts:
            time.sleep(wait_s)
    extra["tunnel_up_mbps"] = round(up, 1)
    extra["tunnel_down_mbps"] = round(down, 1)
    print(
        f"# tunnel: up {up:.1f} MB/s, down {down:.1f} MB/s", file=sys.stderr
    )


def measure_train_slices_per_sec(steps=30, batch=12, image_size=256,
                                 frozen=False):
    """Fused DP train step throughput (augmentation on), like the trainer
    runs it: async dispatch, one sync at the end. Returns
    (slices_per_sec, model_flops_per_slice) where the FLOPs figure is
    3x the compiled forward's XLA cost-analysis FLOPs (fwd + ~2x for bwd),
    the standard MFU numerator.

    `frozen=True` uses the trainer's real frozen-phase mask (encoder conv
    kernels zeroed, reference trainer :102-116 semantics): the zero
    multipliers are trace-time constants, so XLA dead-code-eliminates the
    encoder backward — the measured speedup over the unfrozen step is the
    evidence for that design claim (VERDICT r4 #3)."""
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace

    from volume_segmantics_tpu.data.losses import get_loss_fn
    from volume_segmantics_tpu.model.model_2d import create_model_on_device
    from volume_segmantics_tpu.parallel.mesh import get_mesh
    from volume_segmantics_tpu.parallel.train import (
        build_dp_train_step,
        make_base_optimizer,
    )
    from volume_segmantics_tpu.utils.base_data_utils import ModelType

    struc = {
        "type": ModelType.U_NET,
        "encoder_name": "resnet34",
        "encoder_weights": None,
        "in_channels": 1,
        "classes": 2,
    }
    from volume_segmantics_tpu.model.operations.vol_seg_2d_trainer import (
        _freeze_mask,
    )

    bundle = create_model_on_device(0, struc, dtype=jnp.bfloat16)
    loss_fn = get_loss_fn(SimpleNamespace(loss_criterion="BCEDiceLoss",
                                          alpha=0.75, beta=0.25))
    tx = make_base_optimizer(weight_decay=0.01)
    mask = _freeze_mask(bundle.params, frozen=frozen)
    opt_state = tx.init(bundle.params)
    mesh = get_mesh()
    step = build_dp_train_step(
        bundle.module, loss_fn, tx, mask, num_labels=2,
        image_size=image_size, mesh=mesh, compute_dtype=jnp.bfloat16,
        augment=True,
    )

    # Model FLOPs per slice from the compiled forward's cost analysis.
    flops_per_slice = None
    try:
        fwd = jax.jit(
            lambda v, x: bundle.module.apply(v, x, train=False)
        )
        x = jnp.zeros((batch, image_size, image_size, 1), jnp.bfloat16)
        cost = fwd.lower(bundle.variables, x).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        fwd_flops = float(cost.get("flops", 0.0))
        if fwd_flops > 0:
            flops_per_slice = 3.0 * fwd_flops / batch
    except Exception as e:  # pragma: no cover - cost analysis is best-effort
        print(f"# cost analysis unavailable: {e}", file=sys.stderr)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (batch, image_size, image_size),
                                      dtype=np.uint8))
    masks = jnp.asarray(rng.integers(0, 2, (batch, image_size, image_size),
                                     dtype=np.uint8))
    params, bs_, opt = bundle.params, bundle.batch_stats, opt_state
    key = jax.random.PRNGKey(0)
    # Warm-up/compile
    params, bs_, opt, loss = step(params, bs_, opt, images, masks, 1e-3, key)
    _ = np.asarray(loss)
    # Best of 3 windows: the shared chip/tunnel fluctuates 1.5-2x between
    # quiet and contended minutes, and throughput is about the machine's
    # capability, not the neighbours'.
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(steps):
            key, sub = jax.random.split(key)
            params, bs_, opt, loss = step(params, bs_, opt, images, masks, 1e-3, sub)
        _ = np.asarray(loss)
        dt = time.perf_counter() - t0
        best = max(best, steps * batch / dt)
    return best, flops_per_slice


def train_tutorial_and_dice(data, labels, workdir: Path, profile="parity"):
    """Train on the synthetic vessels volume with the REFERENCE default
    schedule (8 frozen + 5 unfrozen epochs, patience 3 — the shipped
    2d_model_train_settings.yaml, matching reference volseg-settings/
    2d_model_train_settings.yaml:16-18) and return
    (dice, train_wallclock_s, model_path).

    `profile` is the `performance_profile` settings key: "parity" trains at
    the reference's batch 12, "throughput" at the measured MXU-optimal
    batch. The wall-clock covers the user-facing training cost end to end:
    volume slicing, both LR-finder sweeps, and both training phases."""
    import volume_segmantics_tpu.utils.base_data_utils as utils
    from volume_segmantics_tpu.data import TrainingDataSlicer, get_settings_data
    from volume_segmantics_tpu.model import (
        VolSeg2dTrainer,
        VolSeg2DPredictionManager,
    )

    settings = get_settings_data(
        Path(__file__).parent / "volseg-settings" / "2d_model_train_settings.yaml"
    )
    settings.slice_to_disk = False
    settings.performance_profile = profile
    settings.model = {"type": "U_Net", "encoder_name": "resnet34",
                      "encoder_weights": None}
    # No ImageNet weights exist in this environment, so the frozen phase
    # trains the decoder against RANDOM frozen encoder features. At parity
    # (51 steps/epoch) that still converges; at batch 128 (4-5 steps per
    # epoch) it measured Dice 0.04 — exactly the situation the
    # `skip_frozen_without_pretrained` setting exists for, so the
    # throughput profile folds the frozen epochs into the unfrozen phase
    # (same 13-epoch reference budget, all spent learning).
    from volume_segmantics_tpu.scripts.train_2d_model import (
        resolve_training_phases,
    )

    settings.skip_frozen_without_pretrained = profile == "throughput"
    frozen_epochs, unfrozen_epochs = resolve_training_phases(settings)
    t0 = time.perf_counter()
    slicer = TrainingDataSlicer(data, labels, settings)
    trainer = VolSeg2dTrainer.from_slicer(slicer, slicer.num_seg_classes, settings)
    model_path = workdir / f"bench_tutorial_model_{profile}.pytorch"
    if frozen_epochs:
        trainer.train_model(model_path, frozen_epochs, settings.patience,
                            create=True, frozen=True)
    if unfrozen_epochs:
        trainer.train_model(model_path, unfrozen_epochs, settings.patience,
                            create=frozen_epochs == 0, frozen=False)
    train_wallclock = time.perf_counter() - t0

    pred_settings = get_settings_data(
        Path(__file__).parent / "volseg-settings" / "2d_model_predict_settings.yaml"
    )
    pred_settings.clip_data = False
    pred_settings.one_hot = False
    pred_settings.output_probs = False

    mgr = VolSeg2DPredictionManager(model_path, data, pred_settings)
    prediction = mgr.predict_volume_to_path(None, utils.Quality.HIGH)
    gt = (labels > 0).astype(np.uint8)
    pred_bin = (np.asarray(prediction) > 0).astype(np.uint8)
    inter = float((gt & pred_bin).sum())
    dice = 2 * inter / float(gt.sum() + pred_bin.sum())
    return dice, train_wallclock, model_path


def run_bench(extra, box=None):
    """All measurement stages. Mutates `extra` in place as results land so
    a late-stage failure still reports everything measured before it; the
    headline is also published into `box` the moment it is measured so the
    deadline watchdog can report it even if a later stage wedges.
    Returns the headline wall-clock (256^3 12-way) or raises."""
    box = box if box is not None else {}
    t_start = time.time()
    budget = float(os.environ.get("VOLSEG_BENCH_DEADLINE", 3300))
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace

    import volume_segmantics_tpu.utils.config as cfg
    from volume_segmantics_tpu.model.model_2d import create_model_on_device
    from volume_segmantics_tpu.model.operations.vol_seg_2d_predictor import (
        VolSeg2dPredictor,
    )
    from volume_segmantics_tpu.models.checkpoint import save_checkpoint
    from volume_segmantics_tpu.utils.base_data_utils import ModelType

    dev = jax.devices()[0]
    platform = dev.platform
    device_kind = getattr(dev, "device_kind", "?")
    extra["platform"] = platform
    extra["device_kind"] = device_kind
    print(f"# devices: {jax.devices()} (platform={platform})", file=sys.stderr)

    # --- Train throughput ---------------------------------------------------
    # Perf mode (batch 32) is the headline: the settings expose batch_size
    # and the LR finder adapts the learning rate to the batch empirically;
    # batch 12 (the reference's GPU-era constant) is kept as the parity
    # default and reported alongside.
    # Every train stage is guarded individually: losing a throughput number
    # must never abort the run before the headline predict measurement.
    print("# measuring train step throughput...", file=sys.stderr)
    peak = _peak_flops(device_kind) if platform == "tpu" else None
    flops_per_slice = None
    for key, mfu_key, batch, steps, frozen in (
        ("train_slices_per_sec_chip", "train_mfu_pct", 32, 30, False),
        ("train_slices_per_sec_chip_b12", None, 12, 30, False),
        ("train_slices_per_sec_chip_b128", "train_mfu_pct_b128", 128, 12,
         False),
        # Frozen-phase step (encoder backward DCE'd by the zero freeze
        # mask): the reference default schedule spends 8 of 13 epochs here
        # (reference volseg-settings/2d_model_train_settings.yaml:16-17).
        ("train_slices_per_sec_chip_frozen_b128", None, 128, 12, True),
    ):
        try:
            sps, fps = measure_train_slices_per_sec(batch=batch, steps=steps,
                                                    frozen=frozen)
            extra[key] = round(sps, 1)
            flops_per_slice = flops_per_slice or fps
            if flops_per_slice:
                extra.setdefault(
                    "model_gflops_per_slice_fwdbwd",
                    round(flops_per_slice / 1e9, 2),
                )
                if peak and mfu_key:
                    extra[mfu_key] = round(
                        100.0 * sps * flops_per_slice / peak, 2
                    )
            print(
                f"# train slices/s (b{batch}): {sps:.1f}"
                + (f" (mfu={extra[mfu_key]}%)"
                   if mfu_key and mfu_key in extra else ""),
                file=sys.stderr,
            )
        except Exception as e:  # pragma: no cover - protect the headline
            print(f"# train stage b{batch} failed: {e}", file=sys.stderr)
            extra[key] = None
    if extra.get("train_slices_per_sec_chip_frozen_b128") and extra.get(
        "train_slices_per_sec_chip_b128"
    ):
        # >1 means the freeze-mask really eliminated the encoder backward
        # (documented with the measured figure in docs/DESIGN.md).
        extra["train_frozen_speedup_b128"] = round(
            extra["train_slices_per_sec_chip_frozen_b128"]
            / extra["train_slices_per_sec_chip_b128"],
            3,
        )
        print(
            f"# frozen-phase speedup (b128): "
            f"{extra['train_frozen_speedup_b128']}x",
            file=sys.stderr,
        )

    # --- Predict wall-clocks ------------------------------------------------
    struc = {
        "type": ModelType.U_NET,
        "encoder_name": "resnet34",
        "encoder_weights": None,
        "in_channels": cfg.MODEL_INPUT_CHANNELS,
        "classes": 2,
    }
    bundle = create_model_on_device(0, struc)
    elapsed256 = None
    with tempfile.TemporaryDirectory() as td:
        ckpt = Path(td) / "bench_model.pytorch"
        save_checkpoint(ckpt, bundle.variables, struc, label_codes={})
        settings = SimpleNamespace(
            clip_data=False, st_dev_factor=2.575, downsample=False,
            data_hdf5_path="/data", cuda_device=0, one_hot=False,
            output_probs=False, quality="high", prediction_axis="Z",
        )
        predictor = VolSeg2dPredictor(ckpt, settings)
        rng = np.random.default_rng(0)

        vol256 = rng.integers(0, 255, (256,) * 3).astype(np.uint8)
        if platform == "tpu":
            _wait_quiet_tunnel(extra)
        for attempt in range(3):
            try:
                print("# warm-up (compile) 256**3...", file=sys.stderr)
                predictor._predict_12_ways_max_probs(vol256, output_probs=False)
                elapsed256 = _best_time(
                    lambda: predictor._predict_12_ways_max_probs(
                        vol256, output_probs=False
                    )
                )
                break
            except Exception as e:  # pragma: no cover - transient tunnel issue
                if attempt == 2:
                    raise
                print(f"# attempt failed ({e}); retrying in 30s", file=sys.stderr)
                time.sleep(30)
        print(f"# 256^3 12-way: {elapsed256:.2f}s", file=sys.stderr)
        box["headline"] = elapsed256

        # Transfer-independent compute time: the same 8-sweep 12-way TTA
        # with the volume pre-staged on device and the outputs left there.
        # Immune to tunnel congestion — reports the chip, not the link.
        try:
            import jax

            vol256_dev = jax.device_put(vol256)
            jax.block_until_ready(vol256_dev)
            extra["predict_256cube_12way_device_s"] = round(
                _best_time(
                    lambda: jax.block_until_ready(
                        predictor._predict_12_ways_device(
                            vol256_dev, output_probs=False
                        )[0]
                    ),
                    budget_s=60.0,
                ),
                3,
            )
            print(
                f"# 256^3 12-way device-only: "
                f"{extra['predict_256cube_12way_device_s']}s",
                file=sys.stderr,
            )
        except Exception as e:  # pragma: no cover
            print(f"# device-only 256^3 stage failed: {e}", file=sys.stderr)
            extra["predict_256cube_12way_device_s"] = None

        # The 512-cube stage moves the bench's largest transfers; a
        # transient tunnel failure here must not discard the headline
        # number already measured above.
        try:
            vol512 = rng.integers(0, 255, (512,) * 3).astype(np.uint8)
            print("# warm-up (compile) 512**3...", file=sys.stderr)
            predictor._predict_12_ways_max_probs(vol512, output_probs=False)
            extra["predict_512cube_12way_wallclock_s"] = round(
                _best_time(
                    lambda: predictor._predict_12_ways_max_probs(
                        vol512, output_probs=False
                    ),
                    budget_s=240.0,
                ),
                3,
            )
            print(
                f"# 512^3 12-way: "
                f"{extra['predict_512cube_12way_wallclock_s']}s",
                file=sys.stderr,
            )
            import jax

            vol512_dev = jax.device_put(vol512)
            jax.block_until_ready(vol512_dev)
            extra["predict_512cube_12way_device_s"] = round(
                _best_time(
                    lambda: jax.block_until_ready(
                        predictor._predict_12_ways_device(
                            vol512_dev, output_probs=False
                        )[0]
                    ),
                    budget_s=120.0,
                ),
                3,
            )
            print(
                f"# 512^3 12-way device-only: "
                f"{extra['predict_512cube_12way_device_s']}s",
                file=sys.stderr,
            )
        except Exception as e:  # pragma: no cover - transient tunnel issue
            print(f"# 512^3 stage failed: {e}", file=sys.stderr)
            extra.setdefault("predict_512cube_12way_wallclock_s", None)

        # --- Beyond-HBM streaming predictor on chip (VERDICT r4 #5) -----
        # 768^3 (1.7x the 512^3 in-memory run's voxels) through
        # VolSegLargeVolPredictor: input slabs stream up, labels stream
        # down, device memory stays slab-bounded. Evidence of the constant
        # footprint: peak LIVE device bytes sampled at ~10 Hz during the
        # run (the axon PJRT backend reports no memory_stats; live-array
        # accounting measures the same thing from the client side) stay
        # far below the full-volume containers the in-memory path would
        # allocate. LOW quality (single z sweep, no probs) bounds the
        # tunnel time.
        try:
            from volume_segmantics_tpu.model.operations.vol_seg_large_predictor import (
                VolSegLargeVolPredictor,
            )

            def _watched(fn):
                """Run fn() while sampling peak live device bytes."""
                import threading

                peak = {"b": 0}
                stop = threading.Event()

                def sample():
                    while not stop.is_set():
                        try:
                            b = sum(
                                a.nbytes
                                for a in jax.live_arrays()
                                if getattr(a, "nbytes", None)
                            )
                            peak["b"] = max(peak["b"], b)
                        except Exception:
                            pass
                        stop.wait(0.1)

                th = threading.Thread(target=sample, daemon=True)
                th.start()
                t0 = time.perf_counter()
                fn()
                dt = time.perf_counter() - t0
                stop.set()
                th.join(2.0)
                return dt, round(peak["b"] / 1e6, 1)

            # Contrast point: peak live bytes of the IN-MEMORY 512^3
            # 12-way path (full volume + merge containers on device).
            _, peak512 = _watched(
                lambda: jax.block_until_ready(
                    predictor._predict_12_ways_device(
                        vol512_dev, output_probs=False
                    )[0]
                )
            )
            extra["predict_512cube_inmem_peak_live_mb"] = peak512

            vol768 = rng.integers(0, 255, (768,) * 3, dtype=np.uint8)
            large = VolSegLargeVolPredictor(
                predictor, workdir=Path(td) / "stream768", slab_size=64
            )
            print("# warm-up (compile) 768^3 streaming...", file=sys.stderr)
            large.predict_single_axis(vol768, output_probs=False)
            dt, peak768 = _watched(
                lambda: large.predict_single_axis(vol768, output_probs=False)
            )
            extra["predict_768cube_stream_wallclock_s"] = round(dt, 3)
            extra["predict_768cube_stream_peak_live_mb"] = peak768
            print(
                f"# 768^3 streaming (LOW, z): {dt:.1f}s, peak live device "
                f"mem {peak768} MB (512^3 in-memory path: {peak512} MB)",
                file=sys.stderr,
            )
            del large, vol768
        except Exception as e:  # pragma: no cover
            print(f"# 768^3 streaming stage failed: {e}", file=sys.stderr)
            extra.setdefault("predict_768cube_stream_wallclock_s", None)

    # --- Tutorial train wall-clock + Dice (VERDICT r4 #4) ----------------
    # The user-facing headline cost: the reference default two-phase
    # schedule end-to-end, in both performance profiles, each followed by a
    # 12-way HIGH-quality predict scored against the ground truth.
    data, gt_labels = _tutorial_volumes(256)
    for profile, dice_key, wc_key in (
        ("parity", "tutorial_dice", "tutorial_train_wallclock_s_parity"),
        ("throughput", "tutorial_dice_throughput",
         "tutorial_train_wallclock_s_throughput"),
    ):
        # Each full reference-schedule train costs ~5-16 min on the
        # tunneled host (parity pays per-step host+link overhead 13x51
        # times); never start one the deadline watchdog would kill —
        # partial evidence beats a truncated record.
        remaining = budget - (time.time() - t_start) - 60.0
        if remaining < 700.0:
            print(
                f"# skipping tutorial [{profile}]: {remaining:.0f}s of "
                "bench budget left (< 700s)",
                file=sys.stderr,
            )
            continue
        print(
            f"# training on synthetic vessels tutorial volume "
            f"[{profile}]...",
            file=sys.stderr,
        )
        with tempfile.TemporaryDirectory() as td:
            try:
                dice, wallclock, _ = train_tutorial_and_dice(
                    data, gt_labels, Path(td), profile=profile
                )
                extra[dice_key] = round(dice, 4)
                extra[wc_key] = round(wallclock, 1)
                print(
                    f"# tutorial [{profile}]: train {wallclock:.1f}s, "
                    f"12-way dice {dice:.4f}",
                    file=sys.stderr,
                )
            except Exception as e:  # pragma: no cover
                print(f"# tutorial [{profile}] failed: {e}", file=sys.stderr)
                extra.setdefault(dice_key, None)
                extra.setdefault(wc_key, None)

    return elapsed256


def _inner_main():
    extra = {}

    # Deadline + stall watchdog: EVERYTHING — including the backend probe —
    # runs in a daemon thread; if any of it wedges (a fully stalled
    # device<->host transfer or compile RPC has no in-process timeout —
    # both observed on the shared tunnel), the main thread still prints the
    # one JSON line with everything measured so far and force-exits 0.
    # Probe time counting against the deadline keeps the child's lifetime
    # within the supervisor's hard timeout (ADVICE r4: a slow-but-
    # successful probe must never let the supervisor SIGKILL the child
    # before the child's own watchdog has reported partial results). The
    # STALL clause fires long before the deadline when no stage makes
    # progress (no stderr note, no package log record, no new `extra`
    # entry), so the supervising process has budget left to retry in a
    # fresh process. Stuck daemon threads die with the process.
    import threading

    deadline = float(os.environ.get("VOLSEG_BENCH_DEADLINE", 3300))
    stall_s = float(os.environ.get("VOLSEG_BENCH_STALL", 1200))
    sys.stderr = _LivenessStderr(sys.stderr)
    logging.getLogger().addHandler(_ProgressLogHandler())
    # Per-epoch trainer INFO lines double as tutorial-stage liveness.
    logging.getLogger().setLevel(logging.INFO)
    box = {}

    def work():
        platform, kind_or_reason = probe_backend()
        if platform is None:
            box["error"] = f"backend-unavailable: {kind_or_reason}"
            return
        try:
            from volume_segmantics_tpu.utils.device import configure_platform

            configure_platform()
        except Exception as e:  # pragma: no cover
            print(f"# configure_platform failed: {e}", file=sys.stderr)
        try:
            box["headline"] = run_bench(extra, box)
        except Exception as e:
            import traceback

            traceback.print_exc(file=sys.stderr)
            box["error"] = f"{type(e).__name__}: {str(e)[:400]}"

    def progress_count():
        return len(extra) + len(box)

    _PROGRESS["t"] = time.time()
    start = time.time()
    th = threading.Thread(target=work, daemon=True)
    th.start()
    last_count = progress_count()
    timeout_error = None
    while th.is_alive():
        th.join(min(5.0, deadline))
        if not th.is_alive():
            break
        now = time.time()
        if progress_count() != last_count:
            last_count = progress_count()
            _PROGRESS["t"] = now
        if now - start > deadline:
            timeout_error = f"bench-deadline-exceeded: {deadline:.0f}s"
            break
        if now - _PROGRESS["t"] > stall_s:
            timeout_error = (
                f"bench-stalled: no stage progress in {stall_s:.0f}s "
                "(wedged backend RPC?)"
            )
            break
    headline = box.get("headline")
    if timeout_error and th.is_alive():
        _emit(
            round(headline, 3) if headline else None, extra,
            error=timeout_error,
        )
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
    if "error" in box and headline is None:
        _emit(None, extra, error=box["error"])
    else:
        _emit(round(headline, 3) if headline else None, extra,
              error=box.get("error"))


def _parse_record(stdout_text):
    """Last parseable JSON line of a child's stdout, or None."""
    for ln in reversed((stdout_text or "").strip().splitlines()):
        ln = ln.strip()
        if not ln.startswith("{"):
            continue
        try:
            return json.loads(ln)
        except Exception:
            continue
    return None


def main():
    """Supervisor: run the measurement in a CHILD process and retry once in
    a fresh process when it produced no headline (backend-unavailable,
    stalled on a wedged RPC, crashed, or had to be killed). A wedged tunnel
    RPC poisons the whole JAX runtime of its process, but a fresh client
    connects fine (observed) — so the retry is a real second chance, not a
    repeat of the same hang. Prints EXACTLY one JSON line and exits 0;
    `extra` metrics from a failed first attempt are merged into the final
    record so partial evidence is never discarded."""
    if os.environ.get("VOLSEG_BENCH_INNER") == "1":
        return _inner_main()
    total = float(os.environ.get("VOLSEG_BENCH_DEADLINE", 3300))
    attempts = int(os.environ.get("VOLSEG_BENCH_ATTEMPTS", 2))
    start = time.time()
    merged_extra = {}
    last_rec = None
    last_reason = "no-attempt-ran"
    try:
        for i in range(attempts):
            remaining = total - (time.time() - start)
            if i > 0 and remaining < 60:
                break  # not enough budget for a meaningful retry
            env = {
                **os.environ,
                "VOLSEG_BENCH_INNER": "1",
                "VOLSEG_BENCH_DEADLINE": str(max(remaining - 30.0, 1.0)),
            }
            print(
                f"# bench attempt {i + 1}/{attempts} "
                f"(budget {max(remaining - 30.0, 1.0):.0f}s)",
                file=sys.stderr,
            )
            out = None
            killed = None
            try:
                r = subprocess.run(
                    [sys.executable, str(Path(__file__).resolve())],
                    stdout=subprocess.PIPE,
                    text=True,
                    timeout=max(remaining + 60.0, 90.0),
                    env=env,
                    cwd=str(Path(__file__).resolve().parent),
                )
                out = r.stdout
            except subprocess.TimeoutExpired as e:
                # Child's own watchdog failed to fire — salvage any output.
                out = e.stdout
                if isinstance(out, bytes):
                    out = out.decode(errors="replace")
                killed = "killed: child exceeded hard timeout"
            rec = _parse_record(out)
            if rec is None:
                # Attribute the failure to THIS attempt (ADVICE r4: a
                # stale attempt-1 'killed' string must not mislabel a
                # different attempt-2 failure).
                last_reason = (
                    f"attempt {i + 1}: {killed or 'produced no record'}"
                )
                continue
            if isinstance(rec.get("extra"), dict):
                # A retry's failed stages write extra[key] = None; never
                # let that erase a real measurement from an earlier attempt
                # (ADVICE r4 — 'partial evidence is never discarded').
                merged_extra.update({
                    k: v
                    for k, v in rec["extra"].items()
                    if v is not None or k not in merged_extra
                })
            last_rec = rec
            if rec.get("value") is not None or not rec.get("error"):
                break  # success — no retry needed
            last_reason = f"attempt {i + 1}: {rec.get('error')}"
    except Exception as e:  # pragma: no cover - supervisor must never raise
        last_reason = f"supervisor-error: {type(e).__name__}: {str(e)[:200]}"
    if last_rec is not None:
        last_rec["extra"] = merged_extra
        print(json.dumps(last_rec))
    else:
        _emit(None, merged_extra, error=last_reason)


if __name__ == "__main__":
    main()
