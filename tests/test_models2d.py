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


class _TorchRefBackbone(torch.nn.Module):
    """Reference Backbone (backbones.py:13-65): resnet34 trunk, stride-1
    7x7 stem, 5 skip features; torchvision state_dict key names."""

    def __init__(self, cin):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, 64, 7, stride=1, padding=3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.maxpool = torch.nn.MaxPool2d(3, stride=2, padding=1)
        widths, sizes = (64, 128, 256, 512), (3, 4, 6, 3)
        c = 64
        for i, (wd, nb) in enumerate(zip(widths, sizes), start=1):
            blocks = []
            for b in range(nb):
                stride = 2 if (b == 0 and i > 1) else 1
                blocks.append(_TorchBasicBlock(c, wd, stride))
                c = wd
        # note: dropout after layer3/4 is eval-mode identity; omitted
            setattr(self, f"layer{i}", torch.nn.Sequential(*blocks))

    def forward(self, x):
        feats = []
        x = torch.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = self.maxpool(x)
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
            feats.append(x)
        return feats


class _TorchRefNet2DSeg(torch.nn.Module):
    """Line-for-line torch twin of the reference Net2DSeg
    (2d_net/model.py:35-180) for full-branch parity testing."""

    def __init__(self, num_classes):
        super().__init__()
        self.rgb_backbone = _TorchRefBackbone(3)
        self.depth_backbone = _TorchRefBackbone(1)

        def dec_stage(cin, cout, num_concat, num_concat_t=1):
            conv = torch.nn.Sequential(
                torch.nn.Conv2d(num_concat * cout, cout, 3, padding=1),
                torch.nn.BatchNorm2d(cout),
                torch.nn.ReLU(inplace=True),
            )
            t_conv = torch.nn.Sequential(
                torch.nn.ConvTranspose2d(cout * num_concat_t, cin, 2, stride=2),
                torch.nn.BatchNorm2d(cin),
                torch.nn.ReLU(inplace=True),
            )
            return conv, t_conv

        _, self.dec_t_conv_stage5 = dec_stage(256, 512, 1, num_concat_t=2)
        self.dec_conv_stage4, self.dec_t_conv_stage4 = dec_stage(128, 256, 3)
        self.dec_conv_stage3, self.dec_t_conv_stage3 = dec_stage(64, 128, 3)
        self.dec_conv_stage2, self.dec_t_conv_stage2 = dec_stage(64, 64, 3)
        self.dec_conv_stage1 = torch.nn.Conv2d(3 * 64, 64, 3, padding=1)
        self.dow_avg = torch.nn.AvgPool2d((5, 5), stride=(1, 1), padding=(2, 2))
        self.con1_1_avg = torch.nn.Conv2d(64, num_classes, 1)
        self.aux = torch.nn.Module()
        self.aux.con1_1_avg = torch.nn.Conv2d(64, num_classes, 1)
        self.aux.linear = torch.nn.Linear(64, num_classes)  # unused (ref too)

    def forward(self, img, depth, img_indices):
        h, w = img.shape[2], img.shape[3]
        pad_h = (-h) % 16
        pad_w = (-w) % 16
        if pad_h or pad_w:
            img = torch.nn.functional.pad(img, [0, pad_w, 0, pad_h])
            depth = torch.nn.functional.pad(depth, [0, pad_w, 0, pad_h])
        f_rgb = self.rgb_backbone(img)
        f_d = self.depth_backbone(depth)
        segm = self.dec_t_conv_stage5(torch.cat([f_d[4], f_rgb[4]], 1))
        segm = self.dec_conv_stage4(torch.cat([f_d[3], segm, f_rgb[3]], 1))
        segm = self.dec_t_conv_stage4(segm)
        segm = self.dec_conv_stage3(torch.cat([f_d[2], segm, f_rgb[2]], 1))
        segm = self.dec_t_conv_stage3(segm)
        segm = self.dec_conv_stage2(torch.cat([f_d[1], segm, f_rgb[1]], 1))
        segm = self.dec_t_conv_stage2(segm)
        segm = self.dec_conv_stage1(torch.cat([f_d[0], segm, f_rgb[0]], 1))
        segm_last = segm[:, :, :h, :w]
        seg2d = self.con1_1_avg(self.dow_avg(segm_last))
        aux2d = self.aux.con1_1_avg(self.dow_avg(segm_last))

        def lift(t):
            out = []
            for i in range(t.shape[0]):
                out.append(
                    t.permute(0, 2, 3, 1)[i][img_indices[i][:, 0], img_indices[i][:, 1]]
                )
            return torch.cat(out, 0)

        return seg2d, lift(seg2d), aux2d, lift(aux2d), segm_last


def test_net2dseg_full_branch_torch_parity(rng):
    """Whole 2D branch (dual encoders + decoder + pooled heads + lifting)
    == the reference's torch graph with imported weights, fp32 eval.

    Anchors: 2d_net/model.py:35-180 (decoder wiring, avg-pool-then-1x1
    heads, per-sample lifting), backbones.py:13-65."""
    from mm2d3d_tpu.models.torch_import import net2dseg_state_dict_to_flax

    torch.manual_seed(0)
    c = 6
    twin = _TorchRefNet2DSeg(c)
    g = torch.Generator().manual_seed(3)
    for m in twin.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    twin.eval()

    b, h, w, n = 2, 33, 48, 25  # odd H exercises the pad-to-16 crop path
    img = rng.rand(b, 3, h, w).astype(np.float32)
    depth = rng.rand(b, 1, h, w).astype(np.float32)
    idx = np.stack([rng.randint(0, h, (b, n)), rng.randint(0, w, (b, n))], -1)
    with torch.no_grad():
        seg2d_t, lift_t, aux2d_t, auxl_t, last_t = twin(
            torch.from_numpy(img), torch.from_numpy(depth),
            torch.from_numpy(idx),
        )

    model = Net2DSeg(num_classes=c, compute_dtype=jnp.float32)
    imgj = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    depj = jnp.asarray(np.transpose(depth, (0, 2, 3, 1)))
    idxj = jnp.asarray(idx.astype(np.int32))
    maskj = jnp.ones((b, n), bool)
    variables = model.init(jax.random.PRNGKey(0), imgj, depj, idxj, maskj, False)
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params, stats = net2dseg_state_dict_to_flax(sd)
    jax.tree_util.tree_map(  # mapped tree must match the model's exactly
        lambda a, b_: None, variables["params"], params
    )
    preds, segm_last, aux = model.apply(
        {"params": params, "batch_stats": stats}, imgj, depj, idxj, maskj, False
    )

    def nchw(x):
        return np.transpose(np.asarray(x), (0, 3, 1, 2))

    np.testing.assert_allclose(
        np.asarray(segm_last), np.transpose(last_t.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(nchw(preds["seg_logit_2d"]), seg2d_t.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(preds["seg_logit"]).reshape(b * n, c), lift_t.numpy(),
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(aux["seg_logit_avg"]).reshape(b * n, c), auxl_t.numpy(),
        rtol=1e-3, atol=1e-4)
