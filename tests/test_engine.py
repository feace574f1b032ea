"""End-to-end engine test: train tiny UNet on synthetic VOC, checkpoint,
resume, history contract (the minimum E2E slice of SURVEY.md §7 step 2)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insarseg.config import get_preset
from insarseg.data.synthetic import make_synthetic_voc
from insarseg.data.voc import BatchLoader, VOCSegDataset
from insarseg.models.unet import UNet
from insarseg.train import engine
from insarseg.train.checkpoint import Checkpointer
from insarseg.utils.history import save_history, load_history


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    make_synthetic_voc(str(root), n_train=8, n_val=4, size=16)
    cfg = get_preset(
        "unet", voc_root=str(root), image_size=16, batch_size=4, num_epochs=2,
        learning_rate=1e-2,
    )
    train_ds = VOCSegDataset(cfg.voc_root, cfg.image_size, "train")
    val_ds = VOCSegDataset(cfg.voc_root, cfg.image_size, "val")
    train_loader = BatchLoader(train_ds, cfg.batch_size, shuffle=True, seed=0)
    val_loader = BatchLoader(val_ds, cfg.batch_size)
    model = UNet(num_classes=cfg.num_classes, base_features=4)
    return cfg, model, train_loader, val_loader


def test_fit_end_to_end(setup, tmp_path):
    cfg, model, train_loader, val_loader = setup
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    history = engine.fit(
        model, cfg, train_loader, val_loader, checkpointer=ckpt, verbose=False
    )
    assert len(history) == cfg.num_epochs
    # reference JSON key contract (metrics v1 preset: acc + miou)
    h0 = history[0]
    for key in ("epoch", "train_loss", "train_acc", "train_miou",
                "val_loss", "val_acc", "val_miou"):
        assert key in h0, key
    assert h0["epoch"] == 1
    # training reduces loss on this easy synthetic task
    assert history[-1]["train_loss"] < history[0]["train_loss"] * 1.5
    # checkpoints exist
    assert os.path.isdir(ckpt.best_path)
    assert ckpt.has_latest()

    # history JSON round-trip
    p = str(tmp_path / "hist.json")
    save_history(history, p)
    loaded = load_history(p)
    assert loaded[0]["epoch"] == 1
    assert all(isinstance(v, (int, float)) for v in loaded[0].values())


def test_checkpoint_resume(setup, tmp_path):
    cfg, model, train_loader, _ = setup
    ckpt = Checkpointer(str(tmp_path / "ckpt2"))
    first = next(iter(train_loader))
    state = engine.create_state(
        model, jax.random.key(0), jnp.asarray(first["image"]), cfg.learning_rate
    )
    train_step = engine.make_train_step(model, cfg.num_classes, cfg.ignore_index)
    state, _ = train_step(
        state, jnp.asarray(first["image"]), jnp.asarray(first["mask"]),
        jax.random.key(1),
    )
    ckpt.save_latest(state)

    fresh = engine.create_state(
        model, jax.random.key(9), jnp.asarray(first["image"]), cfg.learning_rate
    )
    restored = ckpt.restore_latest(fresh)
    assert int(restored.step) == 1
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_eval_deterministic(setup):
    cfg, model, train_loader, val_loader = setup
    first = next(iter(train_loader))
    state = engine.create_state(
        model, jax.random.key(0), jnp.asarray(first["image"]), cfg.learning_rate
    )
    eval_step = engine.make_eval_step(model, cfg.num_classes, cfg.ignore_index)
    r1 = engine.evaluate(eval_step, state.params, state.batch_stats, val_loader,
                         verbose=False)
    r2 = engine.evaluate(eval_step, state.params, state.batch_stats, val_loader,
                         verbose=False)
    assert r1 == r2


def test_fit_reproducible_with_seed(setup):
    cfg, model, _, _ = setup
    import dataclasses
    cfg1 = dataclasses.replace(cfg, num_epochs=1)
    ds = VOCSegDataset(cfg.voc_root, cfg.image_size, "train")

    def run():
        loader = BatchLoader(ds, cfg.batch_size, shuffle=True, seed=cfg.seed)
        return engine.fit(model, cfg1, loader, verbose=False)

    # same seed + deterministic per-epoch shuffle => identical history
    assert run() == run()


def test_global_metrics_mode(setup):
    cfg, model, train_loader, val_loader = setup
    import dataclasses
    first = next(iter(train_loader))
    state = engine.create_state(
        model, jax.random.key(0), jnp.asarray(first["image"]), cfg.learning_rate
    )
    eval_step = engine.make_eval_step(model, cfg.num_classes, cfg.ignore_index)
    rb = engine.evaluate(eval_step, state.params, state.batch_stats, val_loader,
                         version=2, mode="batch_mean", verbose=False)
    rg = engine.evaluate(eval_step, state.params, state.batch_stats, val_loader,
                         version=2, mode="global", verbose=False)
    # both produce the full key set; values differ in general (dataset mIoU
    # != mean of batch mIoUs) but must be in [0, 1]
    for r in (rb, rg):
        for k in ("val_acc", "val_miou", "val_mpa", "val_mf1"):
            assert 0.0 <= r[k] <= 1.0, (k, r)


def test_drop_last_removes_padded_tail_bn_deviation(tmp_path):
    """Config.drop_last (round-4 verdict #5): with a dataset whose size is
    not a batch multiple, the padded tail batch feeds all-zero images into
    BatchNorm's training statistics — the one known training-parity
    deviation vs the reference, which trains on a genuinely smaller final
    batch (/root/reference/Unet.py:341-349). drop_last=True must make the
    epoch's running stats EXACTLY those of the full batches alone."""
    root = tmp_path / "voc6"
    make_synthetic_voc(str(root), n_train=6, n_val=2, size=16)
    cfg = get_preset("unet", voc_root=str(root), image_size=16, batch_size=4,
                     num_epochs=1, drop_last=True)
    assert cfg.drop_last is True  # Config field exists and presets accept it
    ds = VOCSegDataset(cfg.voc_root, cfg.image_size, "train")
    model = UNet(num_classes=cfg.num_classes, base_features=4)

    def run_epoch(batches):
        first = batches[0]
        state = engine.create_state(
            model, jax.random.key(0), jnp.asarray(first["image"]),
            cfg.learning_rate)
        step = engine.make_train_step(model, cfg.num_classes,
                                      cfg.ignore_index)
        for b in batches:
            state, _ = step(state, jnp.asarray(b["image"]),
                            jnp.asarray(b["mask"]), jax.random.key(1))
        return state

    pad_batches = list(BatchLoader(ds, 4, shuffle=True, seed=0))
    drop_batches = list(BatchLoader(ds, 4, shuffle=True, seed=0,
                                    drop_last=True))
    assert len(pad_batches) == 2 and len(drop_batches) == 1
    # same shuffle order: the dropped epoch IS the padded epoch minus tail
    np.testing.assert_array_equal(pad_batches[0]["image"],
                                  drop_batches[0]["image"])

    s_drop = run_epoch(drop_batches)
    s_full_only = run_epoch(pad_batches[:1])
    s_pad = run_epoch(pad_batches)
    for a, b in zip(jax.tree.leaves(s_drop.batch_stats),
                    jax.tree.leaves(s_full_only.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the padded tail genuinely perturbs the stats (the deviation that
    # drop_last removes is real, not vacuous)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(s_pad.batch_stats),
                             jax.tree.leaves(s_drop.batch_stats))]
    assert max(diffs) > 0


def test_bf16_training_smoke(setup):
    """compute_dtype=bfloat16 training: loss decreases, params stay f32."""
    cfg, _, train_loader, _ = setup
    import dataclasses
    from insarseg.models.registry import build_model
    cfg1 = dataclasses.replace(cfg, num_epochs=2, compute_dtype="bfloat16",
                               learning_rate=1e-2)
    model = build_model(dataclasses.replace(cfg1, model="unet"))
    # narrow net for CPU speed
    from insarseg.models.unet import UNet
    model = UNet(num_classes=2, base_features=4, dtype=jnp.bfloat16)
    h = engine.fit(model, cfg1, train_loader, verbose=False)
    assert h[-1]["train_loss"] < h[0]["train_loss"] * 1.2
    assert all(np.isfinite(v) for hh in h for v in hh.values())
