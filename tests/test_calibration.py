"""int8 calibration hardening: the calibration-statistic contract
(insarseg/ops/quant.py::calib_stat_fn), outlier robustness of percentile
clipping, and the metric-level QA bound — a trained model's int8 engine must
score within a stated mIoU distance of its module graph (stronger than the
argmax-agreement tests in test_unet_int8.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insarseg.engines import make_engine


def test_calib_stat_fn_contract():
    from insarseg.ops.quant import calib_stat_fn

    t = jnp.concatenate([jnp.linspace(-1.0, 1.0, 9999), jnp.array([100.0])])
    assert float(calib_stat_fn("absmax")(t)) == 100.0
    p = float(calib_stat_fn("p99.9")(t))
    assert 0.9 < p < 1.2, p  # the outlier is clipped, inliers set the scale
    with pytest.raises(ValueError, match="unknown calibration stat"):
        calib_stat_fn("max")
    # percents only: 'p999' (not a percent) and 'p100' (would be absmax
    # but trips users expecting clipping) are rejected loudly, never
    # silently reinterpreted
    with pytest.raises(ValueError, match="percentile"):
        calib_stat_fn("p999")
    with pytest.raises(ValueError, match="percentile"):
        calib_stat_fn("p100")


def _smooth(rng, shape):
    b, h, w, c = shape
    coarse = rng.standard_normal((b, max(h // 4, 1), max(w // 4, 1), c))
    return np.asarray(jax.image.resize(
        jnp.asarray(coarse, jnp.float32), shape, "bilinear"))


@pytest.mark.slow
def test_percentile_calibration_survives_outlier_batch():
    """A single saturated pixel in the calibration data must not blow up
    the activation scales: absmax follows the outlier, p99.9 stays at the
    inlier range and keeps the argmax agreement with the module graph."""
    from insarseg.models.unet import UNet

    model = UNet(num_classes=2, base_features=16, use_se=True)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    rng = np.random.default_rng(0)
    clean = _smooth(rng, (4, 32, 32, 1))
    poisoned = clean.copy()
    poisoned[0, 0, 0, 0] = 1e4  # one saturated pixel (sensor glitch)

    from insarseg.models.unet_int8 import pack_unet_int8

    p_abs = pack_unet_int8(variables, [poisoned], s2d=True)
    p_pct = pack_unet_int8(variables, [poisoned], s2d=True,
                           calib_stat="p99.9")
    # the outlier drives every absmax scale up from the input onward; the
    # percentile scales stay at the clean batch's order of magnitude
    assert p_abs["scales"]["in"] > 50 * p_pct["scales"]["in"]

    x = jnp.asarray(clean)
    want = jnp.argmax(model.apply(variables, x, train=False), -1)
    int8_pct = make_engine("unet", "channel", model, variables, "int8",
                           calib_batches=[poisoned], calib_stat="p99.9")
    got = jnp.argmax(int8_pct(x), -1)
    agree = float(jnp.mean((got == want).astype(jnp.float32)))
    assert agree > 0.99, agree


def test_multibatch_calibration_maxes_over_batches():
    """Scales must cover every calibration batch, not just the first."""
    from insarseg.models.unet import UNet
    from insarseg.models.unet_int8 import pack_unet_int8

    model = UNet(num_classes=2, base_features=16, use_se=True)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    rng = np.random.default_rng(1)
    small = _smooth(rng, (2, 32, 32, 1)) * 0.1
    large = _smooth(rng, (2, 32, 32, 1)) * 3.0
    p_small = pack_unet_int8(variables, [small], s2d=True)
    p_both = pack_unet_int8(variables, [small, large], s2d=True)
    assert p_both["scales"]["in"] > 5 * p_small["scales"]["in"]


@pytest.mark.slow
def test_trained_model_int8_miou_within_bound():
    """Metric-level QA: train U-Net-CA on the smooth-threshold synthetic
    task, then require |mIoU(int8) - mIoU(module)| <= 0.02 on held-out
    batches with multi-batch calibration — the bound a user relies on when
    serving a trained checkpoint through the int8 engine (stronger than
    argmax agreement: it bounds the score, not just the labels). 0.02 and
    not tighter because a 30-step model's decision boundary is soft: int8
    rounding shifts borderline pixels BOTH ways (measured int8 0.0102
    ABOVE module on one seed); production-scale evidence is the 512^2
    head-to-head run in README.md ("fast-variant accuracy")."""
    import optax

    from insarseg.models.unet import UNet
    from insarseg.train import metrics as M
    from insarseg.train.engine import create_state, make_train_step

    rng = np.random.default_rng(0)
    model = UNet(num_classes=2, base_features=16, use_se=True)

    def batch(b=8, hw=32):
        base = rng.standard_normal((b, hw // 8, hw // 8, 1)).astype(np.float32)
        img = np.array(jax.image.resize(jnp.asarray(base), (b, hw, hw, 1),
                                        "linear"))
        mask = (img[..., 0] > 0.0).astype(np.int32)
        return jnp.asarray(img), jnp.asarray(mask)

    img, mask = batch()
    state = create_state(model, jax.random.key(0), img, tx=optax.adam(3e-3))
    step = make_train_step(model, num_classes=2, normalize=None)
    key = jax.random.key(1)
    for _ in range(30):
        img, mask = batch()
        key, k = jax.random.split(key)
        state, out = step(state, img, mask, k)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    calib = [np.asarray(batch()[0]) for _ in range(3)]
    int8 = make_engine("unet", "channel", model, variables, "int8",
                       calib_batches=calib)
    module = make_engine("unet", "channel", model, variables, "module")

    # ONE held-out eval set scored by both engines — scoring each on
    # different random draws would conflate sampling noise with
    # quantization error
    eval_set = [batch() for _ in range(4)]

    def miou(predict):
        counts = None
        for img, mask in eval_set:
            c = M.confusion_counts(predict(img), mask, 2, 255)
            counts = c if counts is None else \
                jax.tree.map(jnp.add, counts, c)
        return float(M.metrics_v2(counts)["miou"])

    m_module, m_int8 = miou(module), miou(int8)
    assert m_module > 0.7, f"task must be learned, got mIoU {m_module}"
    assert abs(m_int8 - m_module) <= 0.02, (m_module, m_int8)
