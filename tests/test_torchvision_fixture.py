"""Independent torchvision golden check (auto-activates when a fixture is
present).

The fixture (generated OFFLINE by tests/make_torchvision_fixture.py where
torchvision exists — it is not installed in this sandbox, see PARITY.md
"Golden-fixture provenance") stores torchvision's sorted (name, shape)
manifest, one input, and the logits real torchvision code produced from a
deterministically PRNG-filled state_dict. Here the identical state_dict is
reconstructed with numpy alone, pushed through the torch->JAX converter,
and the insarseg model must reproduce the logits — an oracle independent
of tests/torch_ref.py."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insarseg.compat.torch_io import (
    segmentation_variables_from_torch,
    segmentation_variables_to_torch,
)
from insarseg.models.deeplab import DeepLabV3
from insarseg.models.fcn import FCN
from tests.make_torchvision_fixture import FIXTURE_DIR, fill_state_dict

CASES = [
    ("deeplabv3", lambda: DeepLabV3(num_classes=2)),
    ("fcn", lambda: FCN(num_classes=2)),
]


def _fixture(tag):
    path = os.path.join(FIXTURE_DIR, f"torchvision_{tag}_r50.npz")
    if not os.path.exists(path):
        pytest.skip(f"offline torchvision fixture not vendored ({path}); "
                    "generate with tests/make_torchvision_fixture.py")
    return np.load(path, allow_pickle=False)


@pytest.mark.parametrize("tag,ctor", CASES)
def test_torchvision_fixture_logits(tag, ctor):
    fx = _fixture(tag)
    manifest = [(n, tuple(s)) for n, s in json.loads(str(fx["manifest"]))]
    sd = fill_state_dict(manifest)
    variables = segmentation_variables_from_torch(sd, model=tag)
    model = ctor()
    x = jnp.asarray(fx["input"]).transpose(0, 2, 3, 1)  # NCHW -> NHWC
    got = model.apply(variables, x, train=False)
    want = jnp.asarray(fx["logits"]).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-4)


@pytest.mark.parametrize("tag,ctor", CASES)
def test_exporter_manifest_matches_torchvision(tag, ctor):
    """Architecture-wiring check: the exporter's (name, shape) set must be
    exactly torchvision's state_dict manifest (modulo num_batches_tracked,
    which carries no math)."""
    fx = _fixture(tag)
    manifest = {(n, tuple(s)) for n, s in json.loads(str(fx["manifest"]))
                if not n.endswith("num_batches_tracked")}
    model = ctor()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
    sd = segmentation_variables_to_torch(variables, model=tag)
    ours = {(n, tuple(np.asarray(v).shape)) for n, v in sd.items()
            if not n.endswith("num_batches_tracked")}
    assert ours == manifest
