"""Full-model parity vs the reference beyond the 2D encoder:

- structural parity of the 3D net's layer plan (channels/reps/BN constants)
  against ``3d_net/scn_unet.py:35-126`` + ``3d_net/model.py:23-95``;
- one-step train-LOSS parity: the real `MM2D3DTask.train_step` driven by
  stub models emitting fixed logits, compared against a minimal torch
  reimplementation of the reference loss composition
  (``train.py:186-292``: weighted CE + lambda-weighted cross-modal KL on
  source and target).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mm2d3d_tpu.models.sparse_unet import MaskedBatchNorm, Net3DSeg
from mm2d3d_tpu.train.batch import build_topology
from mm2d3d_tpu.train.step import MM2D3DTask

torch = pytest.importorskip("torch")


def _tiny_batch(rng, b=2, n=64, h=16, w=16, c=6, full_scale=64):
    from mm2d3d_tpu.data.synthetic import make_batch

    return jax.tree_util.tree_map(
        jnp.asarray,
        make_batch(rng, batch_size=b, height=h, width=w, n_points=n,
                   num_classes=c, full_scale=full_scale),
    )


@pytest.mark.slow  # compiles the whole 3D net at fp32/HIGHEST
def test_net3d_structural_parity(rng):
    """Layer plan == UNetSCN(m=16, num_planes=7, reps=1, VGG):
    planes [16,32,48,64,80,96,112], SubmConv 3^3 everywhere, stride-2
    down/up with (8, cin, cout) taps, decoder convs over 2x-concat inputs,
    dual heads + Linear(3->1) sigmoid gate (scn_unet.py:90-126,
    3d_net/model.py:23-95)."""
    batch = _tiny_batch(rng)
    grid, hier = build_topology(batch, 64, 7, slot_caps=None)
    model = Net3DSeg(num_classes=6)  # defaults mirror the reference config
    feats = jnp.zeros((batch.coords.shape[0] * batch.coords.shape[1], 3))
    variables = model.init(jax.random.PRNGKey(0), feats, grid, hier, False)
    p = variables["params"]

    planes = [16, 32, 48, 64, 80, 96, 112]
    # sigmoid RGB gate: Linear(3, 1) (3d_net/model.py:32)
    assert p["linear_rgb_mask"]["kernel"].shape == (3, 1)
    # input conv: SubmanifoldConvolution(3, in=3, m=16, 3) (scn_unet.py:114)
    assert p["net_3d"]["input_conv"]["kernel"].shape == (27, 3, 16)
    unet = p["net_3d"]["unet"]
    for l in range(7):
        # one VGG rep per level (block_reps=1): BN + ReLU -> SubmConv
        enc = unet[f"enc_{l}_0"]
        assert enc["conv"]["kernel"].shape == (27, planes[l], planes[l])
        assert set(enc.keys()) == {"bn", "conv"}  # VGG, not residual
        if l > 0:
            # stride-2 Convolution(3, a, b, 2, 2) fine->coarse
            assert unet[f"down_{l}"]["kernel"].shape == (8, planes[l - 1], planes[l])
        if l < 6:
            # Deconvolution back + decoder conv over [enc_l, up] concat
            assert unet[f"up_{l}"]["kernel"].shape == (8, planes[l + 1], planes[l])
            dec = unet[f"dec_{l}_0"]
            assert dec["conv"]["kernel"].shape == (27, 2 * planes[l], planes[l])
    # trailing BN+ReLU then the dual heads: Linear(16 -> C) each
    assert "out_bn" in p["net_3d"]
    assert p["linear"]["kernel"].shape == (16, 6)
    assert p["aux_linear_point"]["kernel"].shape == (16, 6)
    # BN constants follow SCN defaults (eps 1e-4, momentum 0.9), ReLU
    # (leakiness=0, scn_unet.py:100)
    assert MaskedBatchNorm.eps == 1e-4
    assert MaskedBatchNorm.momentum == 0.9


class _Stub2D(nn.Module):
    """Fixed-logits 2D branch (parameter-tied so grads exist)."""

    main: np.ndarray  # (B, N, C)
    aux_avg: np.ndarray  # (B, N, C)

    @nn.compact
    def __call__(self, img, depth, img_indices, point_mask, train=False):
        w = self.param("w", nn.initializers.zeros, (1,))
        self.variable("batch_stats", "dummy", jnp.zeros, (1,))
        z = w[0] * 0.0
        b, h, ww = img.shape[0], img.shape[1], img.shape[2]
        c = self.main.shape[-1]
        preds = {
            "seg_logit": jnp.asarray(self.main) + z,
            "seg_logit_2d": jnp.zeros((b, h, ww, c)),
        }
        aux = {
            "seg_logit_avg": jnp.asarray(self.aux_avg) + z,
            "seg_logit_avg_2d": jnp.zeros((b, h, ww, c)),
        }
        return preds, jnp.zeros((b, h, ww, 64)), aux


class _Stub3D(nn.Module):
    main: np.ndarray  # (P, C)
    aux_point: np.ndarray  # (P, C)

    @nn.compact
    def __call__(self, feats, grid, hier, train=False):
        w = self.param("w", nn.initializers.zeros, (1,))
        self.variable("batch_stats", "dummy", jnp.zeros, (1,))
        z = w[0] * 0.0
        preds = {
            "seg_logit": jnp.asarray(self.main) + z,
            "confidence": jnp.zeros((self.main.shape[0], 1)),
        }
        aux = {"seg_logit_point": jnp.asarray(self.aux_point) + z}
        return preds, jnp.zeros((self.main.shape[0], 16)), aux


def test_train_step_loss_parity_vs_torch(rng):
    """One real `train_step` (stub logits) == the reference loss recipe in
    torch: F.cross_entropy(weight, ignore -100) on source +
    lambda * KL(log_softmax(aux) || softmax(main.detach())).sum(1).mean()
    cross-modal on source AND target (train.py:186-292)."""
    b, n, c = 2, 64, 6
    lam_src, lam_trg = 1.0, 0.1
    weights = np.array([1.9, 1.0, 2.1, 2.7, 1.5, 1.8], np.float32)

    batch = _tiny_batch(rng, b=b, n=n, c=c)
    batch = batch.replace(point_mask=jnp.ones((b, n), bool))  # all valid
    p = b * n
    logits = {
        k: rng.randn(p, c).astype(np.float32)
        for k in ("m2s", "a2s", "m3s", "a3s")
    }
    labels = np.asarray(batch.seg_label).reshape(p)
    labels = np.where(labels < 0, 0, labels)  # all-valid labels
    batch = batch.replace(seg_label=jnp.asarray(labels.reshape(b, n)))

    task = MM2D3DTask(
        num_classes=c, class_weights=weights,
        lambda_xm_src=lam_src, lambda_xm_trg=lam_trg,
        full_scale=64, num_planes=3, m=8, compute_dtype=jnp.float32,
        model2d=_Stub2D(main=logits["m2s"].reshape(b, n, c),
                        aux_avg=logits["a2s"].reshape(b, n, c)),
        model3d=_Stub3D(main=logits["m3s"], aux_point=logits["a3s"]),
    )
    state = task.init_state(jax.random.PRNGKey(0), batch)
    _, logs = task.jit_train_step(state, batch, batch, jax.random.PRNGKey(1))
    logs = {k: float(v) for k, v in logs.items()}

    # --- minimal torch reimplementation of train.py:186-292 -----------------
    tl = {k: torch.from_numpy(v) for k, v in logits.items()}
    lab = torch.from_numpy(labels.astype(np.int64))
    w_t = torch.from_numpy(weights)
    seg2d = torch.nn.functional.cross_entropy(tl["m2s"], lab, weight=w_t)
    seg3d = torch.nn.functional.cross_entropy(tl["m3s"], lab, weight=w_t)

    def xm(student, teacher):
        return torch.nn.functional.kl_div(
            torch.nn.functional.log_softmax(student, dim=1),
            torch.nn.functional.softmax(teacher.detach(), dim=1),
            reduction="none",
        ).sum(1).mean()

    xm_2d = xm(tl["a2s"], tl["m3s"])  # 2D student vs 3D teacher
    xm_3d = xm(tl["a3s"], tl["m2s"])
    # stubs emit the same logits on source and target, so the torch twin's
    # target-domain terms reuse them
    loss_2d = seg2d + lam_src * xm_2d + lam_trg * xm_2d
    loss_3d = seg3d + lam_src * xm_3d + lam_trg * xm_3d
    total = float(loss_2d + loss_3d)

    np.testing.assert_allclose(logs["train/loss_segmentation"], float(seg2d), rtol=1e-5)
    np.testing.assert_allclose(logs["train/loss_segmentation_3d"], float(seg3d), rtol=1e-5)
    np.testing.assert_allclose(logs["train/xm_loss_src_2d"], float(xm_2d), rtol=1e-5)
    np.testing.assert_allclose(logs["train/xm_loss_src_3d"], float(xm_3d), rtol=1e-5)
    np.testing.assert_allclose(logs["train/xm_loss_tgt_2d"], float(xm_2d), rtol=1e-5)
    np.testing.assert_allclose(logs["train/loss_total"], total, rtol=1e-5)
