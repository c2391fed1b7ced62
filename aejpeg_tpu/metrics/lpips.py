"""LPIPS (AlexNet backbone) in JAX.

Architecture parity with the `lpips` package used by the reference
(net='alex', src/image/evaluation_metrics.py:34-36): inputs scaled to
[-1, 1], ImageNet-style shift/scale normalization, AlexNet conv features
after each of the 5 ReLU stages, channel-unit-normalized, squared
differences projected by learned 1x1 "lin" weights, spatially averaged and
summed over stages.

Pretrained weights cannot be fetched in this environment (zero egress,
torchvision/lpips absent).  Supply them as an .npz via `weights_path` or the
AEJPEG_LPIPS_WEIGHTS env var; `convert_torch_checkpoint` turns the lpips
package's checkpoint + torchvision alexnet state dict into that .npz.
"""

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature config: (out_ch, kernel, stride, padding), with ReLU after
# each conv and max-pool after stages 1, 2, 5.
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1, 4}
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _max_pool_3x3s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(3, stride=2) (floor mode, no padding); x is NCHW."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID")


def _alex_features(params: Dict[str, np.ndarray], x: jnp.ndarray):
    """x: (N, 3, H, W) in [-1, 1] -> list of 5 post-ReLU feature maps."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / \
        jnp.asarray(_SCALE)[None, :, None, None]
    feats = []
    for i, (_, k, s, p) in enumerate(_ALEX_CONVS):
        w = jnp.asarray(params[f"conv{i}_w"])  # (out, in, k, k)
        b = jnp.asarray(params[f"conv{i}_b"])
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(s, s), padding=[(p, p), (p, p)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x + b[None, :, None, None]
        x = jax.nn.relu(x)
        feats.append(x)
        if i in _POOL_AFTER and i != 4:
            x = _max_pool_3x3s2(x)
    return feats


def _unit_normalize(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(f ** 2, axis=1, keepdims=True))
    return f / (norm + eps)


@functools.lru_cache(maxsize=2)
def _load_weights(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def default_weights_path() -> Optional[str]:
    env = os.environ.get("AEJPEG_LPIPS_WEIGHTS")
    if env and os.path.exists(env):
        return env
    local = os.path.join(os.path.dirname(__file__), "lpips_alex.npz")
    return local if os.path.exists(local) else None


def lpips_distance(a: np.ndarray, b: np.ndarray,
                   weights_path: Optional[str] = None) -> jnp.ndarray:
    """LPIPS distance between two (H, W, 3) float32 [0,1] images."""
    path = weights_path or default_weights_path()
    if path is None:
        raise FileNotFoundError(
            "LPIPS weights not available. Export them with "
            "aejpeg_tpu.metrics.lpips.convert_torch_checkpoint on a machine "
            "with torchvision+lpips, then set AEJPEG_LPIPS_WEIGHTS.")
    params = _load_weights(path)

    def to_nchw(img):
        t = jnp.asarray(img, jnp.float32) * 2.0 - 1.0
        return jnp.transpose(t, (2, 0, 1))[None]

    fa = _alex_features(params, to_nchw(a))
    fb = _alex_features(params, to_nchw(b))
    total = jnp.zeros(())
    for i, (x, y) in enumerate(zip(fa, fb)):
        d = (_unit_normalize(x) - _unit_normalize(y)) ** 2
        lin = jnp.asarray(params[f"lin{i}_w"])  # (1, C, 1, 1)
        val = jnp.sum(d * lin, axis=1, keepdims=True)   # 1x1 conv
        total = total + jnp.mean(val)
    return total


def convert_torch_checkpoint(alexnet_state: dict, lpips_state: dict,
                             out_path: str) -> None:
    """Convert torchvision alexnet.state_dict() + lpips.LPIPS(net='alex')
    .state_dict() tensors into the .npz this module loads.  Runs wherever
    torch + the weights are available (not in this image)."""
    arrays = {}
    conv_ids = [0, 3, 6, 8, 10]  # torchvision alexnet.features indices
    for i, ci in enumerate(conv_ids):
        arrays[f"conv{i}_w"] = np.asarray(
            alexnet_state[f"features.{ci}.weight"], np.float32)
        arrays[f"conv{i}_b"] = np.asarray(
            alexnet_state[f"features.{ci}.bias"], np.float32)
    for i in range(5):
        key = f"lins.{i}.model.1.weight"
        arrays[f"lin{i}_w"] = np.asarray(lpips_state[key], np.float32)
    np.savez(out_path, **arrays)
