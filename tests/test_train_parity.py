"""Training-dynamics parity: identical init + identical batches through
insarseg's jitted train step and a torch-autograd twin with optim.Adam must
produce the same per-step losses.

This is the strongest offline evidence for the BASELINE target "mIoU within
0.1 pt of the reference": if every step's loss matches to float tolerance,
the two training procedures are the same algorithm.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch
import torch.nn.functional as F

from insarseg.models.unet import UNet
from insarseg.train import engine
from tests import torch_ref as TR

LR = 1e-3
STEPS = 3


def _to_torch_tree(tree, grad: bool):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _to_torch_tree(v, grad)
        else:
            tt = torch.from_numpy(np.asarray(v, np.float32).copy())
            tt.requires_grad_(grad)
            out[k] = tt
    return out


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


def test_multi_step_train_loss_matches_torch_adam():
    model = UNet(num_classes=2, base_features=8)
    rng = np.random.default_rng(0)
    images = rng.standard_normal((4, 1, 16, 16), dtype=np.float32)
    masks = rng.integers(0, 2, (4, 16, 16))

    variables = model.init(jax.random.key(3), jnp.asarray(
        np.transpose(images, (0, 2, 3, 1))))
    # -- jax side: Adam with torch defaults, jitted full step
    state = engine.create_state(
        model, jax.random.key(0), jnp.asarray(np.transpose(images, (0, 2, 3, 1))),
        tx=optax.adam(LR, b1=0.9, b2=0.999, eps=1e-8),
    )
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          opt_state=state.tx.init(variables["params"]))
    step = engine.make_train_step(model, 2)

    # -- torch side: same params as live tensors, autograd + optim.Adam
    tparams = _to_torch_tree(variables["params"], grad=True)
    tstats = _to_torch_tree(variables["batch_stats"], grad=False)
    opt = torch.optim.Adam(list(_leaves(tparams)), lr=LR)
    xt = torch.from_numpy(images)
    mt = torch.from_numpy(masks).long()

    jax_losses, torch_losses = [], []
    x = jnp.asarray(np.transpose(images, (0, 2, 3, 1)))
    m = jnp.asarray(masks.astype(np.int32))
    for s in range(STEPS):
        state, out = step(state, x, m, jax.random.key(100 + s))
        jax_losses.append(float(out["loss"]))

        opt.zero_grad()
        logits = TR.unet_forward(xt, tparams, tstats, training=True)
        loss = F.cross_entropy(logits, mt, ignore_index=255)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, atol=5e-4, rtol=1e-4)
    # and the losses actually moved (we trained, not froze)
    assert jax_losses[-1] != jax_losses[0]
