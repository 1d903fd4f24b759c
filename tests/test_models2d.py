"""2D branch tests: torch-weight-import parity + Net2DSeg forward/lifting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm2d3d_tpu.models.net2d import Net2DSeg
from mm2d3d_tpu.models.resnet2d import ResNet34Encoder
from mm2d3d_tpu.models.torch_import import resnet34_state_dict_to_flax

torch = pytest.importorskip("torch")


class _TorchBasicBlock(torch.nn.Module):
    """torchvision-compatible BasicBlock (same state_dict key names)."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idt)


def _torch_reference_backbone(sd_holder):
    """Reference-style backbone: resnet34 trunk with a stride-1 7x7 stem,
    5 skip features (backbones.py:43-65). Random init+stats, eval mode.

    Built by hand with torchvision state_dict key names (no torchvision in
    this image) so the importer mapping is exercised end to end.
    """

    net = torch.nn.Module()
    net.conv1 = torch.nn.Conv2d(3, 64, kernel_size=7, stride=1, padding=3, bias=False)
    net.bn1 = torch.nn.BatchNorm2d(64)
    net.maxpool = torch.nn.MaxPool2d(3, stride=2, padding=1)
    widths, sizes = (64, 128, 256, 512), (3, 4, 6, 3)
    cin = 64
    for i, (wd, nb) in enumerate(zip(widths, sizes), start=1):
        blocks = []
        for b in range(nb):
            stride = 2 if (b == 0 and i > 1) else 1
            blocks.append(_TorchBasicBlock(cin, wd, stride))
            cin = wd
        setattr(net, f"layer{i}", torch.nn.Sequential(*blocks))
    # randomize BN running stats so eval-mode parity is meaningful
    g = torch.Generator().manual_seed(7)
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    net.eval()
    sd_holder.update({k: v.detach().numpy() for k, v in net.state_dict().items()})

    def forward(x):
        feats = []
        x = torch.relu(net.bn1(net.conv1(x)))
        feats.append(x)
        x = net.maxpool(x)
        x = net.layer1(x)
        feats.append(x)
        x = net.layer2(x)
        feats.append(x)
        x = net.layer3(x)
        feats.append(x)
        x = net.layer4(x)
        feats.append(x)
        return feats

    return forward


def test_resnet34_torch_parity(rng):
    sd = {}
    fwd = _torch_reference_backbone(sd)
    x = rng.randn(1, 3, 32, 48).astype(np.float32)
    with torch.no_grad():
        ref = [f.numpy() for f in fwd(torch.from_numpy(x))]

    model = ResNet34Encoder(num_channels=3, compute_dtype=jnp.float32)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = model.init(jax.random.PRNGKey(0), xj, False)
    params, stats = resnet34_state_dict_to_flax(sd)
    got = model.apply(
        {"params": params, "batch_stats": stats}, xj, False
    )

    assert len(got) == len(ref) == 5
    for g, r in zip(got, ref):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        assert g.shape == r.shape
        np.testing.assert_allclose(g, r, rtol=2e-3, atol=2e-4)


def test_net2dseg_forward_and_lifting(rng):
    b, h, w, n, c = 2, 33, 48, 17, 6  # odd H exercises the pad-to-16 path
    model = Net2DSeg(num_classes=c, compute_dtype=jnp.float32)
    img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    depth = jnp.asarray(rng.rand(b, h, w, 1).astype(np.float32))
    idx = jnp.asarray(
        np.stack(
            [rng.randint(0, h, (b, n)), rng.randint(0, w, (b, n))], axis=-1
        ).astype(np.int32)
    )
    mask = jnp.asarray(rng.rand(b, n) < 0.8)

    variables = model.init(jax.random.PRNGKey(0), img, depth, idx, mask, False)
    (preds, segm_last, aux), _ = model.apply(
        variables, img, depth, idx, mask, False, mutable=["batch_stats"]
    )

    assert preds["seg_logit_2d"].shape == (b, h, w, c)
    assert preds["seg_logit"].shape == (b, n, c)
    assert segm_last.shape == (b, h, w, 64)
    assert aux["seg_logit_avg"].shape == (b, n, c)

    # lifting: seg_logit rows equal the dense map at the indices; masked -> 0
    dense = np.asarray(preds["seg_logit_2d"])
    lifted = np.asarray(preds["seg_logit"])
    idx_np, mask_np = np.asarray(idx), np.asarray(mask)
    for bi in range(b):
        for pi in range(n):
            if mask_np[bi, pi]:
                np.testing.assert_allclose(
                    lifted[bi, pi], dense[bi, idx_np[bi, pi, 0], idx_np[bi, pi, 1]],
                    rtol=1e-6,
                )
            else:
                np.testing.assert_array_equal(lifted[bi, pi], 0.0)

    # train mode runs (dropout rng needed)
    model.apply(
        variables, img, depth, idx, mask, True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
    )
