"""LPIPS architecture validation (VERDICT r1 task 10).

Pretrained AlexNet/lin weights are unobtainable here (zero egress,
torchvision absent), so the forward GRAPH is validated instead: with
random-but-fixed weights, the JAX implementation must match an
independent torch replica of the lpips package's net='alex' forward
(conv/pad/stride/pool/unit-normalize/lin semantics) to float tolerance,
and must reproduce a committed golden value so any future drift of the
graph is caught without torch."""

import numpy as np
import pytest

from aejpeg_tpu.metrics import lpips as L


def _rand_params(rng):
    params = {}
    in_ch = 3
    for i, (out, k, _, _) in enumerate(L._ALEX_CONVS):
        params[f"conv{i}_w"] = rng.standard_normal(
            (out, in_ch, k, k)).astype(np.float32) * 0.05
        params[f"conv{i}_b"] = rng.standard_normal(out).astype(
            np.float32) * 0.05
        in_ch = out
        params[f"lin{i}_w"] = np.abs(rng.standard_normal(
            (1, out, 1, 1))).astype(np.float32)
    return params


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(0)
    params = _rand_params(rng)
    path = tmp_path_factory.mktemp("lpips") / "w.npz"
    np.savez(path, **params)
    a = rng.random((64, 96, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    return str(path), params, a, b


def _torch_lpips(params, a, b):
    import torch
    import torch.nn.functional as F

    def feats(img):
        x = torch.from_numpy(img).permute(2, 0, 1)[None] * 2.0 - 1.0
        shift = torch.tensor(L._SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(L._SCALE).view(1, 3, 1, 1)
        x = (x - shift) / scale
        out = []
        for i, (_, k, s, p) in enumerate(L._ALEX_CONVS):
            w = torch.from_numpy(params[f"conv{i}_w"])
            bb = torch.from_numpy(params[f"conv{i}_b"])
            x = F.conv2d(x, w, bb, stride=s, padding=p)
            x = F.relu(x)
            out.append(x)
            if i in L._POOL_AFTER and i != 4:
                x = F.max_pool2d(x, 3, stride=2)
        return out

    fa, fb = feats(a), feats(b)
    total = torch.zeros(())
    for i, (x, y) in enumerate(zip(fa, fb)):
        nx = x / (x.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        ny = y / (y.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (nx - ny) ** 2
        lin = torch.from_numpy(params[f"lin{i}_w"])
        total = total + (d * lin).sum(1, keepdim=True).mean()
    return float(total)


def test_lpips_matches_torch_replica(setup):
    path, params, a, b = setup
    ours = float(L.lpips_distance(a, b, weights_path=path))
    ref = _torch_lpips(params, a, b)
    assert ours == pytest.approx(ref, rel=2e-4), (ours, ref)
    assert ours > 0


def test_lpips_golden_value(setup):
    """Committed golden: catches graph drift without torch present.
    (Value computed from the seeded random weights above.)"""
    path, _, a, b = setup
    ours = float(L.lpips_distance(a, b, weights_path=path))
    assert ours == pytest.approx(0.0362345427274704, rel=5e-4), ours


def test_lpips_raises_without_weights(monkeypatch):
    monkeypatch.delenv("AEJPEG_LPIPS_WEIGHTS", raising=False)
    monkeypatch.setattr(L, "default_weights_path", lambda: None)
    with pytest.raises(FileNotFoundError):
        L.lpips_distance(np.zeros((32, 32, 3), np.float32),
                         np.zeros((32, 32, 3), np.float32))
