"""Forward/loss parity: torch UNet weights imported into the flax UNet must
produce the same logits to 1e-5 (SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from cl_tpu.interop import torch_state_dict_to_variables, \
    variables_to_torch_state_dict
from cl_tpu.models.unet import UNet
from reference_impl.unet import UNet as TorchUNet


def _pair(classes=3, base=8, depth=3, seed=0):
    torch.manual_seed(seed)
    tm = TorchUNet(classes, base, depth).eval()
    variables = torch_state_dict_to_variables(tm.state_dict())
    variables = jax.tree.map(jnp.asarray, variables)
    jm = UNet(num_classes=classes, base_channels=base, depth=depth)
    return tm, jm, variables


def test_forward_logits_match():
    tm, jm, variables = _pair()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    ours = jm.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), atol=1e-4)


def test_loss_matches():
    import torch.nn.functional as F

    from cl_tpu import losses

    tm, jm, variables = _pair(classes=4)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 4, size=(2, 32, 32)).astype(np.int32)
    y[0, :4] = 255
    valid = np.ones(4, bool)
    logits = jm.apply(variables, jnp.asarray(x), train=False)
    ours, _ = losses.cross_entropy(logits, jnp.asarray(y), jnp.asarray(valid))
    with torch.no_grad():
        tl = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        theirs = F.cross_entropy(tl, torch.from_numpy(y.astype(np.int64)),
                                 ignore_index=255)
    np.testing.assert_allclose(float(ours), float(theirs), atol=1e-5)


def test_roundtrip_export():
    tm, jm, variables = _pair()
    sd = variables_to_torch_state_dict(jax.device_get(variables))
    for name, t in tm.state_dict().items():
        if name.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(sd[name], t.numpy(), atol=1e-6,
                                   err_msg=name)
