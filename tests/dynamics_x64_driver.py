"""Float64 training-dynamics parity driver (runs in its OWN process: x64
must be enabled before JAX initializes, and the main test session is f32).

Why f64: in float32, train-mode gradients through a 53-BatchNorm ResNet at
tiny shapes carry 10-20% relative float noise (measured: jax-f32 vs jax-f64
differs as much as jax-f32 vs torch-f32), and Adam amplifies near-zero-grad
elements to O(lr) sign flips — so f32 cross-framework loss curves legitimately
drift and prove nothing beyond their own noise band. In float64 the noise
floor drops ~1e9x; asserting per-step losses to 1e-8 and BN running stats to
1e-7 over 8 Adam steps is evidence that insarseg's train step and torch's
optim.Adam + autograd are THE SAME ALGORITHM, which is what carries the
"mIoU within 0.1 pt" BASELINE claim for the BN-heavy families.

Usage: python dynamics_x64_driver.py  (exit 0 = parity held for both
families; prints per-step losses).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import torch_ref as TR  # noqa: E402
from insarseg.models.deeplab import DeepLabV3  # noqa: E402
from insarseg.models.fcn import FCN  # noqa: E402
from insarseg.models.unet import UNet  # noqa: E402
from insarseg.train import engine  # noqa: E402

LR = 1e-4  # the reference's Adam LR (/root/reference/Unet.py:369)
STEPS = 8


def to_torch(tree, grad, dtype=torch.float64):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = to_torch(v, grad, dtype)
        else:
            tt = torch.from_numpy(np.asarray(v, np.float64).copy()).to(dtype)
            tt.requires_grad_(grad)
            out[k] = tt
    return out


def leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from leaves(v)
        else:
            yield v


def max_stat_diff(jax_stats, torch_stats):
    worst = 0.0
    for k in jax_stats:
        if isinstance(jax_stats[k], dict):
            worst = max(worst, max_stat_diff(jax_stats[k], torch_stats[k]))
        else:
            worst = max(worst, float(np.abs(
                np.asarray(jax_stats[k], np.float64)
                - torch_stats[k].detach().numpy()).max()))
    return worst


def run_family(name):
    size, batch = 32, 4
    if name == "deeplabv3":
        model = DeepLabV3(num_classes=2, dropout_rate=0.0)
        fwd = lambda x, p, s: TR.deeplab_forward(x, p, s, training=True)
    elif name == "fcn":
        model = FCN(num_classes=2, dropout_rate=0.0)
        fwd = lambda x, p, s: TR.fcn_forward(x, p, s, training=True)
    else:  # unet-ca, the flagship, at its preset shape (64^2, batch 8)
        model = UNet(num_classes=2, base_features=16, use_se=True)
        fwd = lambda x, p, s: TR.unet_forward(x, p, s, training=True)
        size, batch = 64, 8

    rng = np.random.default_rng(0)
    batches = [
        (rng.standard_normal((batch, 1, size, size)),
         rng.integers(0, 2, (batch, size, size)))
        for _ in range(2)
    ]
    x0 = jnp.asarray(np.transpose(batches[0][0], (0, 2, 3, 1)), jnp.float64)
    variables = model.init(jax.random.key(3), x0)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                          variables["params"])
    stats = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                         variables["batch_stats"])

    tx = optax.adam(LR, b1=0.9, b2=0.999, eps=1e-8)
    state = engine.TrainState(step=jnp.zeros((), jnp.int32), params=params,
                              batch_stats=stats, opt_state=tx.init(params),
                              tx=tx)
    step = engine.make_train_step(model, 2)

    tparams = to_torch(variables["params"], grad=True)
    tstats = to_torch(variables["batch_stats"], grad=False)
    opt = torch.optim.Adam(list(leaves(tparams)), lr=LR)

    jl, tl = [], []
    for s in range(STEPS):
        images, masks = batches[s % len(batches)]
        x = jnp.asarray(np.transpose(images, (0, 2, 3, 1)), jnp.float64)
        m = jnp.asarray(masks.astype(np.int32))
        state, out = step(state, x, m, jax.random.key(100 + s))
        jl.append(float(out["loss"]))

        opt.zero_grad()
        logits = fwd(torch.from_numpy(images).double(), tparams, tstats)
        loss = F.cross_entropy(logits, torch.from_numpy(masks).long(),
                               ignore_index=255)
        loss.backward()
        opt.step()
        tl.append(float(loss.detach()))

    loss_diff = float(np.abs(np.asarray(jl) - np.asarray(tl)).max())
    stat_diff = max_stat_diff(state.batch_stats, tstats)
    print(f"{name}: max per-step loss diff {loss_diff:.3e}, "
          f"max running-stat diff {stat_diff:.3e}")
    print(f"  losses: {[round(v, 6) for v in jl]}")
    assert loss_diff < 1e-8, (name, jl, tl)
    assert stat_diff < 1e-7, (name, stat_diff)
    assert jl[-1] != jl[0], "did not train"


if __name__ == "__main__":
    for fam in sys.argv[1:] or ["unet-ca", "deeplabv3", "fcn"]:
        run_family(fam)
    print("X64 DYNAMICS PARITY OK")
